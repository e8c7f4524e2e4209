"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just fixtures. Driver-side string properties run the same
normalization code path the Spark expressions encode; Spark-side checks
sample a bounded number of generated rows per case to keep runtime sane."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# Czech alphabet + ascii + whitespace + punctuation, the domain our corpus uses.
_CZ = "áčďéěíňóřšťúůýžÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ"
TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcdefghij XYZ0123456789.,!?\"'\t\n" + _CZ)
    ),
    max_size=80,
)


def _nfd_fold(s: str) -> str:
    d = unicodedata.normalize("NFD", s)
    return "".join(ch for ch in d if not unicodedata.combining(ch))


@st.composite
def _norm_pair(draw):
    return draw(TEXT)


class TestNormalizationProperties:
    @settings(max_examples=200, deadline=None)
    @given(TEXT)
    def test_duckdb_strip_accents_matches_nfd_fold(self, s):
        """The oracle-side normalization (strip_accents) must agree with the
        NFD fold our Spark translate table implements, for any text over
        the corpus alphabet — this equivalence is what makes every text
        oracle trustworthy."""
        want = _nfd_fold(s.lower())
        got = duckdb.sql("SELECT strip_accents(lower(?))", params=[s]).fetchone()[0]
        assert got == want

    @settings(max_examples=200, deadline=None)
    @given(TEXT)
    def test_fold_is_idempotent_and_length_preserving(self, s):
        folded = _nfd_fold(s)
        assert _nfd_fold(folded) == folded
        assert len(folded) == len(s)


class TestSparkTextProperties:
    @pytest.fixture(scope="class")
    def samples(self):
        """Deterministic edge-case set evaluated in ONE Spark job
        (per-example Spark jobs would take minutes)."""
        return [
            "", " ", "a  b", "Příliš žluťoučký KŮŇ", 'quote " inside',
            "tab\tand\nnewline", "číslo 123/2024 Sb.", "ŘŠČŘŽÝÁÍÉ", ". , !",
            "x" * 80,
        ]

    def test_normalize_idempotent_and_fold_stable(self, spark, samples):
        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.functions.text import normalize_text

        df = spark.createDataFrame([(s,) for s in samples], "t string")
        out = df.select(
            normalize_text("t").alias("once"),
            normalize_text(normalize_text("t")).alias("twice"),
            F.length(normalize_text("t")).alias("len_once"),
        ).collect()
        for r in out:
            assert r["once"] == r["twice"]  # idempotent
            assert " \t" not in r["once"] and "\n" not in r["once"]
            assert r["once"] == r["once"].strip()

    def test_token_count_bounds(self, spark, samples):
        from pspcz_analyzer_spark.functions.text import token_count, tokens

        df = spark.createDataFrame([(s,) for s in samples], "t string")
        import pyspark.sql.functions as F

        rows = df.select(
            "t", token_count("t").alias("n"), F.size(tokens("t")).alias("sz")
        ).collect()
        for r in rows:
            assert r["n"] >= 0
            if r["t"].strip() == "":
                assert r["n"] == 0
            else:
                assert r["n"] == len(r["t"].split())


class TestPaginationProperties:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 7), st.integers(1, 20))
    def test_offset_pages_partition_the_sequence(self, per_page, n_rows):
        """Offset pagination must tile [1..n] exactly: no gaps, no overlaps
        (pure arithmetic property of the page/per_page math)."""
        pages = []
        page = 1
        while (page - 1) * per_page < n_rows:
            lo = (page - 1) * per_page
            hi = min(lo + per_page, n_rows)
            pages.append(list(range(lo + 1, hi + 1)))
            page += 1
        flat = [x for p in pages for x in p]
        assert flat == list(range(1, n_rows + 1))
        assert all(len(p) <= per_page for p in pages)


class TestStripHtmlProperty:
    """strip_html vs a stdlib html.parser oracle over GENERATED markup —
    one Spark job over a seeded random corpus (per-example jobs would take
    minutes), driver-side oracle per row."""

    @staticmethod
    def _gen_fragment(rng) -> str:
        # Well-formed domain: no raw "<" inside text (real markup escapes
        # it; parsers legitimately disagree on pathological bare "<").
        words = ["zákon", "tisk", "č.", "42", "data", "x>y", "a&b", "ať"]
        entities = ["&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;",
                    "&ndash;", "&amp;lt;"]
        tags = ["p", "div", "b", "span", "h1", "li"]
        parts = []
        for _ in range(rng.randint(1, 12)):
            kind = rng.random()
            if kind < 0.35:
                parts.append(rng.choice(words))
            elif kind < 0.5:
                parts.append(rng.choice(entities))
            elif kind < 0.7:
                t = rng.choice(tags)
                inner = " ".join(
                    rng.choice(words) for _ in range(rng.randint(0, 3))
                )
                attr = ' class="x"' if rng.random() < 0.3 else ""
                parts.append(f"<{t}{attr}>{inner}</{t}>")
            elif kind < 0.8:
                parts.append(f"<!-- {rng.choice(words)} -->")
            elif kind < 0.9:
                parts.append(f"<script>if (a < {rng.randint(0, 9)}) x();</script>")
            else:
                parts.append(f"<style>p {{ margin: {rng.randint(0, 9)}px }}</style>")
            parts.append(rng.choice([" ", "  ", "\n", "\t ", " "]))
        return "".join(parts)

    def test_matches_stdlib_parser_on_generated_markup(self, spark):
        import random

        import pyspark.sql.functions as F

        from pspcz_analyzer_spark.functions.text import strip_html
        from tests.test_text_functions import _stdlib_strip_html

        rng = random.Random(20260814)
        frags = [self._gen_fragment(rng) for _ in range(150)]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(frags)], "i long, raw string"
        )
        rows = df.select("i", strip_html("raw").alias("clean")).collect()
        for r in sorted(rows, key=lambda r: r["i"]):
            assert r["clean"] == _stdlib_strip_html(frags[r["i"]]), frags[r["i"]]


class TestAsofJoinProperty:
    """asof_join vs a per-row brute force over generated keyed time series —
    both directions, both strictness modes, with cross-side timestamp ties
    (right sides are unique per (key, time), the documented contract)."""

    @staticmethod
    def _brute(left, right, strict, direction):
        out = {}
        for lk, lt, lid in left:
            cands = []
            for rk, rt, rv in right:
                if rk != lk:
                    continue
                if direction == "backward":
                    ok = rt < lt if strict else rt <= lt
                else:
                    ok = rt > lt if strict else rt >= lt
                if ok:
                    cands.append((rt, rv))
            if cands:
                best = max(cands) if direction == "backward" else min(cands)
                out[lid] = best[1]
            else:
                out[lid] = None
        return out

    def test_matches_brute_force(self, spark):
        import datetime as dt
        import random

        from pspcz_analyzer_spark.operators.joins import asof_join

        rng = random.Random(42)
        base = dt.datetime(2024, 1, 1)

        def ts(h):
            return base + dt.timedelta(hours=h)

        for trial in range(4):
            left = [
                (rng.randint(1, 3), ts(rng.randint(0, 10)), i)
                for i in range(20)
            ]
            right_keys = set()
            right = []
            for v in range(30):
                k, h = rng.randint(1, 3), rng.randint(0, 10)
                if (k, h) not in right_keys:  # unique (key, time) contract
                    right_keys.add((k, h))
                    right.append((k, ts(h), v))
            ldf = spark.createDataFrame(left, "k long, t timestamp, lid long")
            rdf = spark.createDataFrame(right, "k long, rt timestamp, rv long")
            for strict in (True, False):
                for direction in ("backward", "forward"):
                    got = {
                        r["lid"]: r["asof_rv"]
                        for r in asof_join(
                            ldf, rdf, ["k"], "t", "rt", ["rv"],
                            strict=strict, direction=direction,
                        ).collect()
                    }
                    want = self._brute(left, right, strict, direction)
                    assert got == want, (trial, strict, direction)


class TestBoilerplateRemovalProperties:
    """remove_boilerplate_lines vs a per-row brute force over generated
    multi-line corpora — any doc set, any threshold: same survivors, same
    counts, same reassembled text."""

    @staticmethod
    def _brute(docs, min_docs):
        from collections import defaultdict

        df_count = defaultdict(set)
        for doc_id, text in docs:
            for line in text.split("\n"):
                df_count[line].add(doc_id)
        boiler = {l for l, ids in df_count.items() if len(ids) >= min_docs}
        out = {}
        for doc_id, text in docs:
            lines = text.split("\n")
            kept = [l for l in lines if l not in boiler]
            out[doc_id] = (len(lines), len(kept), "\n".join(kept))
        return out

    def test_matches_brute_force(self, spark):
        import random

        from pspcz_analyzer_spark.operators.corpusprep import (
            remove_boilerplate_lines,
        )

        rng = random.Random(7)
        vocab = ["lorem", "ipsum", "NAV BAR", "© footer", "x y", "", "dup dup"]
        for trial in range(4):
            docs = [
                (
                    i,
                    "\n".join(
                        rng.choice(vocab)
                        for _ in range(rng.randint(1, 6))
                    ),
                )
                for i in range(rng.randint(2, 12))
            ]
            min_docs = rng.randint(2, 4)
            df = spark.createDataFrame(docs, "doc_id long, text string")
            got = {
                r.doc_id: (r.n_lines, r.n_kept, r.clean_text)
                for r in remove_boilerplate_lines(df, min_docs=min_docs).collect()
            }
            assert got == self._brute(docs, min_docs), (trial, min_docs, docs)


class TestShuffleOrderProperties:
    """shuffle_order is a bijection onto (shard, pos) whose shard-major
    order equals the key sort, for any id set / seed / shard count."""

    def test_bijection_and_order(self, spark):
        import random

        from pspcz_analyzer_spark.operators.corpusprep import (
            _KNUTH,
            shuffle_order,
        )

        rng = random.Random(11)
        for trial in range(4):
            ids = rng.sample(range(1_000_000), rng.randint(5, 200))
            seed = rng.randint(0, 2**31)
            shards = rng.choice([1, 2, 7, 16])
            df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
            rows = shuffle_order(df, seed=seed, shards=shards).collect()
            assert len(rows) == len(ids)
            coords = {(r.shard, r.pos) for r in rows}
            assert len(coords) == len(ids)  # bijection: no coordinate reused
            for r in rows:
                key = (r.doc_id * _KNUTH + seed) % (1 << 32)
                assert r.shuffle_key == key
                assert 0 <= r.shard < shards
            shard_major = [
                r.doc_id for r in sorted(rows, key=lambda r: (r.shard, r.pos))
            ]
            key_sort = [
                r.doc_id
                for r in sorted(rows, key=lambda r: (r.shuffle_key, r.doc_id))
            ]
            assert shard_major == key_sort, (trial, seed, shards)


class TestDuplicateSpanProperties:
    """duplicate_span_stats / remove_duplicate_spans vs brute force over
    generated corpora: any docs, any window — same dup counts, same
    cleaned text. A tiny vocabulary makes window collisions frequent, so
    the dup machinery is exercised hard, not vacuously."""

    @staticmethod
    def _brute(docs, window, min_docs):
        from collections import defaultdict

        toks = {i: t.split() for i, t in docs}
        occ = defaultdict(set)
        for i, t in toks.items():
            for s in range(len(t) - window + 1):
                occ[" ".join(t[s : s + window])].add(i)
        dup = {w for w, ids in occ.items() if len(ids) >= min_docs}
        stats, removed = {}, {}
        for i, t in toks.items():
            n_wins = max(len(t) - window + 1, 0)
            covered = set()
            n_dup = 0
            for s in range(n_wins):
                if " ".join(t[s : s + window]) in dup:
                    n_dup += 1
                    covered.update(range(s, s + window))
            if n_wins:
                stats[i] = (n_wins, n_dup)
            kept = [tok for j, tok in enumerate(t) if j not in covered]
            removed[i] = (" ".join(kept), len(t) - len(kept))
        return stats, removed

    def test_matches_brute_force(self, spark):
        import random

        from pspcz_analyzer_spark.operators.dedup import (
            duplicate_span_stats,
            remove_duplicate_spans,
        )

        rng = random.Random(99)
        vocab = [f"w{k}" for k in range(12)]
        for trial, window in [(0, 3), (1, 5), (2, 4)]:
            docs = [
                (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
                for i in range(15)
            ]
            df = spark.createDataFrame(docs, "doc_id long, text string")
            want_stats, want_removed = self._brute(docs, window, 2)
            got_stats = {
                r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
                for r in duplicate_span_stats(df, window=window).collect()
            }
            assert got_stats == want_stats, (trial, window)
            got_removed = {
                r["doc_id"]: (r["text_clean"], r["n_tokens_removed"])
                for r in remove_duplicate_spans(df, window=window).collect()
            }
            assert got_removed == want_removed, (trial, window)


class TestSegmentRoundTripProperty:
    """Protocol-level guarantee for two-level manifests: for ANY set of
    per-file maps, segmentize -> expand is the identity on every field,
    and a second segmentize against the first reuses every clean
    segment. Pure fs-level (no Spark) — runs hundreds of cases."""

    @staticmethod
    def _docs(draw):
        names = draw(
            st.lists(
                st.text(
                    alphabet=st.sampled_from("abcdef0123456789"),
                    min_size=4,
                    max_size=8,
                ).map(lambda s: f"{s}.parquet"),
                min_size=1,
                max_size=40,
                unique=True,
            )
        )
        doc = {"version": 1, "files": sorted(names), "txns": {}, "ts": 1.0}
        seq, stats, rows, parts = {}, {}, {}, {}
        for f in names:
            seq[f] = draw(st.integers(1, 5))
            if draw(st.booleans()):
                lo = draw(st.integers(-100, 100))
                stats[f] = {"k": [lo, lo + draw(st.integers(0, 50))]}
            if draw(st.booleans()):
                rows[f] = draw(st.integers(0, 1000))
            if draw(st.booleans()):
                parts[f] = {"day": str(draw(st.integers(0, 3)))}
        doc["seq"] = seq
        if stats:
            doc["stats"] = stats
        if rows:
            doc["rows"] = rows
        if parts:
            doc["partitions"] = parts
        return doc

    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def test_segmentize_expand_identity_and_reuse(self, data):
        import json
        import os
        import tempfile
        import uuid as _uuid

        from pspcz_analyzer_spark import manifest as M
        from pspcz_analyzer_spark.fs import LocalFS

        # fresh dir PER EXAMPLE (a function-scoped fixture would be
        # shared across hypothesis examples)
        rel = os.path.join(
            tempfile.gettempdir(), f"segprop_{_uuid.uuid4().hex[:10]}"
        )
        os.makedirs(rel)
        fs = LocalFS()
        doc = self._docs(data.draw)
        flat = json.loads(json.dumps(doc))  # canonical copy
        two, new1 = M._segmentize(fs, rel, dict(doc), {})
        assert "files" not in two and two["segments"] == new1
        back = M._expand_segments(fs, rel, dict(two))
        for k in ("files", "seq", "stats", "rows", "partitions"):
            assert back.get(k) == flat.get(k), k
        # re-segmentize the SAME content against the first: full reuse
        two2, new2 = M._segmentize(fs, rel, dict(doc), two)
        assert new2 == [] and set(two2["segments"]) == set(two["segments"])
        # drop one file: at most one segment rewritten, identity holds
        victim = flat["files"][0]
        doc2 = json.loads(json.dumps(flat))
        doc2["files"] = [f for f in doc2["files"] if f != victim]
        for k in ("seq", "stats", "rows", "partitions"):
            if k in doc2:
                doc2[k].pop(victim, None)
        two3, new3 = M._segmentize(fs, rel, dict(doc2), two)
        assert len(new3) <= 1
        back3 = M._expand_segments(fs, rel, dict(two3))
        for k in ("files", "seq", "stats", "rows", "partitions"):
            if k in doc2 and doc2[k]:
                assert back3[k] == doc2[k], k
        import shutil

        shutil.rmtree(rel, ignore_errors=True)


def _seal_doc_strategy():
    keys = st.text(
        alphabet=st.sampled_from("abxyz_09" + _CZ), min_size=1, max_size=8
    ).filter(lambda k: k != "crc")
    leaf = (
        st.none()
        | st.booleans()
        | st.integers(-(2**40), 2**40)
        | st.floats(allow_nan=False, allow_infinity=False)
        | st.text(
            alphabet=st.sampled_from('ab"\\\n\t {}[]:,' + _CZ), max_size=12
        )
    )
    nested = st.recursive(
        leaf,
        lambda inner: st.lists(inner, max_size=4)
        | st.dictionaries(keys, inner, max_size=4),
        max_leaves=12,
    )
    return st.dictionaries(keys, nested, max_size=5)


class TestSealUnsealProperty:
    """Integrity contract for crc-sealed manifest blobs (r11): for ANY
    JSON-serializable doc, seal -> unseal is the identity with the crc
    verified; and ANY single-byte flip or truncation of the sealed
    bytes either raises the typed ManifestCorrupt or parses back to
    the EXACT original doc (a mutation that only touches JSON
    whitespace is semantically invisible, and the crc — computed over
    the canonical re-serialization — correctly treats it as benign).
    Nothing may ever come back silently ALTERED."""

    # Top-level key "crc" is reserved by the seal itself; manifest docs
    # never carry one (the writer controls the key set).
    _DOC = _seal_doc_strategy()

    @settings(max_examples=250, deadline=None)
    @given(doc=_DOC)
    def test_roundtrip_identity(self, doc):
        from pspcz_analyzer_spark import manifest as M

        sealed = M._seal_doc(doc)
        assert M._unseal(sealed, "prop") == doc

    @settings(max_examples=250, deadline=None)
    @given(doc=_DOC, data=st.data())
    def test_corruption_detected_or_benign(self, doc, data):
        import re

        from pspcz_analyzer_spark import manifest as M

        orig = M._seal_doc(doc)
        sealed = bytearray(orig)
        mode = data.draw(st.sampled_from(["flip", "truncate"]))
        if mode == "flip":
            i = data.draw(st.integers(0, len(sealed) - 1))
            delta = data.draw(st.integers(1, 255))
            sealed[i] = (sealed[i] + delta) % 256
        else:
            i = data.draw(st.integers(0, len(sealed) - 1))
            sealed = sealed[:i]
        try:
            back = M._unseal(bytes(sealed), "prop")
        except M.ManifestCorrupt:
            return  # detected — the contract's strong arm
        if back == doc:
            return  # byte-benign (whitespace-only mutation)
        # The ONLY other legal outcome is the optional-checksum coverage
        # limit (found by this very test, r11): a flip INSIDE the
        # trailing crc field garbles the field NAME, degrading the blob
        # to a legacy unchecked read. Doc field values must be intact
        # except at most one key absorbing the stray crc token.
        assert mode == "flip" and i >= orig.rfind(b'"crc"')
        diffs = {
            k
            for k in set(doc) | set(back)
            if back.get(k, object()) != doc.get(k, object())
        }
        assert len(diffs) <= 1
        for k in diffs:
            v = back.get(k)
            assert isinstance(v, str) and re.fullmatch(
                r"[0-9a-f]{8}:\d+", v
            ), (k, v)


class TestMergeModelProperty:
    """Model-based check for manifest.merge_into (r11, after the
    NULL-key dup-check fix): random targets/sources — including NULL
    and duplicate keys — and a random clause subset drawn from fixed
    templates, validated against a pure-Python reference model of the
    documented MERGE semantics (delete wins over update; NMS clauses
    see only unmatched target rows; NULL keys never match and insert;
    duplicate NON-null source keys refuse and leave the table
    untouched). Counts and the final (k, v) multiset must both agree."""

    @settings(max_examples=15, deadline=None)
    @given(data=st.data())
    def test_matches_reference_model(self, spark, data):
        import collections
        import os
        import shutil
        import tempfile
        import uuid as _uuid

        from pspcz_analyzer_spark import manifest as M

        keys = st.one_of(st.integers(0, 6), st.none())
        target = data.draw(
            st.lists(st.tuples(keys, st.integers(-5, 5)), max_size=8)
        )
        source = data.draw(
            st.lists(st.tuples(keys, st.integers(-5, 5)), max_size=6)
        )
        upd = data.draw(st.booleans())
        upd_cond = data.draw(st.sampled_from([None, "t.v % 2 = 0"]))
        mdel = data.draw(st.sampled_from([None, "s.v < 0"]))
        ins = data.draw(st.booleans())
        nms_del = data.draw(st.sampled_from([None, True]))
        nms_upd = data.draw(st.booleans()) and nms_del is None

        path = os.path.join(
            tempfile.gettempdir(), f"mrgprop_{_uuid.uuid4().hex[:10]}"
        )
        try:
            tdf = spark.createDataFrame(target, "k long, v long")
            tdf.coalesce(2).write.parquet(path)
            M.manifest_init(path, stat_cols=["k"])
            sdf = spark.createDataFrame(source, "k long, v long")

            nn = [k for k, _ in source if k is not None]
            dup_src = len(nn) != len(set(nn))
            kwargs = dict(
                when_matched_update={"v": "s.v"} if upd else None,
                matched_condition=upd_cond if upd else None,
                when_matched_delete=mdel,
                when_not_matched_insert=ins,
                when_not_matched_by_source_delete=nms_del,
                when_not_matched_by_source_update=(
                    {"v": "-1"} if nms_upd else None
                ),
            )
            if dup_src:
                with pytest.raises(ValueError, match="multiple rows"):
                    M.merge_into(spark, path, sdf, "k", **kwargs)
                got = collections.Counter(
                    (r["k"], r["v"])
                    for r in M.load_manifest_table(spark, path).collect()
                )
                assert got == collections.Counter(target)
                return

            src_by_key = {k: v for k, v in source if k is not None}
            survivors, n_upd, n_del, n_nu, n_nd = [], 0, 0, 0, 0
            for tk, tv in target:
                matched = tk is not None and tk in src_by_key
                if matched:
                    sv = src_by_key[tk]
                    if mdel and sv < 0:
                        n_del += 1
                        continue
                    if upd and (upd_cond is None or tv % 2 == 0):
                        n_upd += 1
                        survivors.append((tk, sv))
                        continue
                    survivors.append((tk, tv))
                else:
                    if nms_del:
                        n_nd += 1
                        continue
                    if nms_upd:
                        n_nu += 1
                        survivors.append((tk, -1))
                        continue
                    survivors.append((tk, tv))
            tkeys = {k for k, _ in target if k is not None}
            inserts = [
                (k, v)
                for k, v in source
                if ins and (k is None or k not in tkeys)
            ]
            res = M.merge_into(spark, path, sdf, "k", **kwargs)
            assert res["updated"] == n_upd and res["deleted"] == n_del
            assert res["inserted"] == len(inserts)
            assert res["nms_updated"] == n_nu and res["nms_deleted"] == n_nd
            got = collections.Counter(
                (r["k"], r["v"])
                for r in M.load_manifest_table(spark, path).collect()
            )
            assert got == collections.Counter(survivors + inserts)
        finally:
            shutil.rmtree(path, ignore_errors=True)


class TestUpsertDeleteModelProperty:
    """Model-based check for the other two DML primitives (same net as
    TestMergeModelProperty): upsert = batch-rows-win (matched non-null
    keys purge, every batch row lands, NULL batch keys always insert);
    delete_keys removes exactly the rows whose key is in the non-null
    key set (NULL-keyed DATA rows always survive — the r10 bug class)."""

    @settings(max_examples=12, deadline=None)
    @given(data=st.data())
    def test_matches_reference_model(self, spark, data):
        import collections
        import os
        import shutil
        import tempfile
        import uuid as _uuid

        from pspcz_analyzer_spark import manifest as M

        keys = st.one_of(st.integers(0, 6), st.none())
        target = data.draw(
            st.lists(st.tuples(keys, st.integers(-5, 5)), max_size=8)
        )
        batch = data.draw(
            st.lists(st.tuples(keys, st.integers(10, 15)), max_size=5)
        )
        del_keys = data.draw(
            st.lists(st.one_of(st.integers(0, 6), st.none()), max_size=5)
        )
        path = os.path.join(
            tempfile.gettempdir(), f"udprop_{_uuid.uuid4().hex[:10]}"
        )
        try:
            spark.createDataFrame(
                target, "k long, v long"
            ).coalesce(2).write.parquet(path)
            M.manifest_init(path, stat_cols=["k"])

            # upsert: non-null batch keys purge their matches; every
            # batch row (dups and NULLs included) lands
            bkeys = {k for k, _ in batch if k is not None}
            expect = [
                (k, v) for k, v in target if k is None or k not in bkeys
            ] + batch
            M.upsert(
                spark,
                spark.createDataFrame(batch, "k long, v long"),
                path,
                "k",
            )
            got = collections.Counter(
                (r["k"], r["v"])
                for r in M.load_manifest_table(spark, path).collect()
            )
            assert got == collections.Counter(expect)

            # delete_keys over the upserted state: exactly the non-null
            # listed keys go; NULL-keyed data rows survive
            dset = {k for k in del_keys if k is not None}
            expect2 = [(k, v) for k, v in expect if k is None or k not in dset]
            nf, nd = M.delete_keys(spark, path, "k", del_keys)
            assert nd == len(expect) - len(expect2)
            got2 = collections.Counter(
                (r["k"], r["v"])
                for r in M.load_manifest_table(spark, path).collect()
            )
            assert got2 == collections.Counter(expect2)
        finally:
            shutil.rmtree(path, ignore_errors=True)
