"""Schema registry for the parliamentary UNL tables.

UNL files are headerless, so column order and types must be declared
externally — the reference keeps parallel ``*_COLUMNS`` lists and
``*_DTYPES`` dicts (/root/reference/pspcz_analyzer/models/schemas.py:18-247).
Here each table is one ordered list of (column, spark_type) pairs; untyped
columns stay ``string`` (UNL parses everything as text first, then casts
leniently — invalid values become null, matching the reference's
``strict=False`` and Spark's ANSI-off cast).

Column names follow psp.cz documentation (Czech) for traceability, exactly
as the reference does.
"""

from __future__ import annotations

from pyspark.sql.types import StructField, StructType, _parse_datatype_string

# table -> ordered (column, type) pairs. "string" = untyped text column.
TABLES: dict[str, list[tuple[str, str]]] = {
    # Voting summary, hlXXXXs.unl (schemas.py:18-50).
    "hl_hlasovani": [
        ("id_hlasovani", "bigint"), ("id_organ", "int"), ("schuze", "int"),
        ("cislo", "int"), ("bod", "int"), ("datum", "string"), ("cas", "string"),
        ("pro", "int"), ("proti", "int"), ("zdrzel", "int"), ("nehlasoval", "int"),
        ("prihlaseno", "int"), ("kvorum", "int"), ("druh_hlasovani", "string"),
        ("vysledek", "string"), ("nazev_dlouhy", "string"), ("nazev_kratky", "string"),
    ],
    # Individual MP votes, hlXXXXhN.unl (schemas.py:54-63).
    "hl_poslanec": [
        ("id_poslanec", "bigint"), ("id_hlasovani", "bigint"), ("vysledek", "string"),
    ],
    # Persons (schemas.py:67-81).
    "osoby": [
        ("id_osoba", "bigint"), ("pred", "string"), ("prijmeni", "string"),
        ("jmeno", "string"), ("za", "string"), ("narozeni", "string"),
        ("pohlavi", "string"), ("zmena", "string"), ("umrti", "string"),
    ],
    # MP seats per period (schemas.py:85-109).
    "poslanec": [
        ("id_poslanec", "bigint"), ("id_osoba", "bigint"), ("id_kraj", "int"),
        ("id_kandidatka", "int"), ("id_obdobi", "int"), ("web", "string"),
        ("ulice", "string"), ("obec", "string"), ("psc", "string"),
        ("email", "string"), ("telefon", "string"), ("fax", "string"),
        ("psp_telefon", "string"), ("foto", "string"), ("facebook", "string"),
    ],
    # Organs (schemas.py:113-130).
    "organy": [
        ("id_organ", "int"), ("organ_id_organ", "int"), ("id_typ_organu", "int"),
        ("zkratka", "string"), ("nazev_organu_cz", "string"),
        ("nazev_organu_en", "string"), ("od_organ", "string"), ("do_organ", "string"),
        ("priorita", "string"), ("cl_organ_base", "string"),
    ],
    # Person x organ membership intervals (schemas.py:134-147).
    "zarazeni": [
        ("id_osoba", "bigint"), ("id_of", "int"), ("cl_funkce", "string"),
        ("od_o", "string"), ("do_o", "string"), ("od_f", "string"), ("do_f", "string"),
    ],
    # Void votes (schemas.py:151-157).
    "zmatecne": [("id_hlasovani", "bigint")],
    # Sessions (schemas.py:161-175).
    "schuze": [
        ("id_schuze", "bigint"), ("id_org", "int"), ("schuze", "int"),
        ("od_schuze", "string"), ("do_schuze", "string"),
        ("aktualizace", "string"), ("pozvanka", "string"),
    ],
    # Agenda items (schemas.py:179-205).
    "bod_schuze": [
        ("id_bod", "bigint"), ("id_schuze", "bigint"), ("id_tisk", "bigint"),
        ("id_typ", "int"), ("bod", "int"), ("uplny_naz", "string"),
        ("uplny_kon", "string"), ("poznamka", "string"), ("id_bod_stav", "int"),
        ("pozvanka", "string"), ("rj", "string"), ("pozn2", "string"),
        ("druh_bodu", "string"), ("id_sd", "bigint"), ("zkratka", "string"),
    ],
    # Parliamentary prints/bills (schemas.py:209-247).
    "tisky": [
        ("id_tisk", "bigint"), ("id_druh", "int"), ("id_typ_zakon", "int"),
        ("ct", "int"), ("id_navrh", "int"), ("id_predkladatel", "int"),
        ("id_org", "int"), ("id_obdobi", "int"), ("id_navrhovatele", "bigint"),
        ("predkladatel", "string"), ("nazev_tisku", "string"),
        ("datum_doruceni", "string"), ("datum_rozeslani", "string"),
        ("cas_doruceni", "string"), ("lhuta", "string"), ("id_stav", "int"),
        ("nazev_cast", "string"), ("popis", "string"), ("dalsi_cast", "string"),
        ("id_navrh_typ", "string"), ("id_session", "string"),
        ("id_poznamka", "string"), ("url_tisk", "string"), ("id_eklep", "string"),
    ],
}


def columns(table: str) -> list[str]:
    return [c for c, _ in TABLES[table]]


def typed_schema(table: str) -> StructType:
    """Target StructType after lenient casting."""
    return StructType(
        [StructField(c, _parse_datatype_string(t), True) for c, t in TABLES[table]]
    )


def cast_types(table: str) -> dict[str, str]:
    """Columns needing a cast away from string."""
    return {c: t for c, t in TABLES[table] if t != "string"}
