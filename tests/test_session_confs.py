"""The SPARK_GRAFT_CONF deployment-lever passthrough (r11 optimization
round): cluster-only knobs (io codec, split sizes, join-strategy
preferences) are injected via env with an EMPTY local default so the
bench stays byte-comparable to the verification driver's environment
while a real deployment can set guide-§9 values without code changes.
"""

from pspcz_analyzer_spark.session import _SCALE_CONFS, parse_env_confs


def test_parse_basic_pairs():
    assert parse_env_confs(
        "spark.io.compression.codec=zstd;"
        "spark.sql.files.maxPartitionBytes=1g"
    ) == {
        "spark.io.compression.codec": "zstd",
        "spark.sql.files.maxPartitionBytes": "1g",
    }


def test_parse_is_whitespace_tolerant_and_skips_junk():
    assert parse_env_confs(
        " spark.a = 1 ;; noequals ; =valueonly ;spark.b=x=y "
    ) == {
        "spark.a": "1",
        # values may themselves contain '=': only the first one splits
        "spark.b": "x=y",
    }


def test_empty_spec_is_empty_default():
    assert parse_env_confs("") == {}


def test_env_confs_override_scale_confs_in_merge_order():
    # get_spark merges {**_SCALE_CONFS, **env_confs, **extra_confs}: an
    # env lever must beat the baked-in local default, and explicit caller
    # extra_confs must beat both.
    env = parse_env_confs("spark.sql.files.maxPartitionBytes=1g")
    extra = {"spark.sql.files.maxPartitionBytes": "256m"}
    assert _SCALE_CONFS["spark.sql.files.maxPartitionBytes"] != "1g"
    merged = {**_SCALE_CONFS, **env}
    assert merged["spark.sql.files.maxPartitionBytes"] == "1g"
    merged_extra = {**_SCALE_CONFS, **env, **extra}
    assert merged_extra["spark.sql.files.maxPartitionBytes"] == "256m"
