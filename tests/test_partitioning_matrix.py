"""Partition-transform matrix: write → manifest → prune → read for every
transform the reference supports (identity, bucket[n], truncate[w],
year, month, day, hour — README.md:52-58,
expressions/Expressions.java:439-465, writer-side evaluation
PartitionedDataFileWriter.java:597-606).  Mirrors the reference's
PartitioningIntegrationTest sweep: each case creates a table partitioned
by one transform, appends rows spanning several partitions (incl. NULL),
and asserts

- the full row set survives the partitioned write,
- an equality predicate on the *source* column prunes to exactly the
  files whose partition value equals the Python-face transform of the
  literal (write path and prune path must agree), and
- rows read back under the predicate are exactly right.
"""

import datetime as dt

import pytest

from swiftlake_spark.tables import expressions as E
from swiftlake_spark.tables.transforms import Transform

SCHEMA = "id BIGINT, n INT, s STRING, ts TIMESTAMP"

ROWS = [
    (1, 7, "alpha", dt.datetime(2023, 3, 5, 4)),
    (2, 7, "alps", dt.datetime(2023, 3, 5, 9)),
    (3, 13, "beta", dt.datetime(2023, 7, 21, 4)),
    (4, 101, "gamma", dt.datetime(2024, 1, 2, 23)),
    (5, 107, "gamble", dt.datetime(2024, 12, 31, 0)),
    (6, None, None, dt.datetime(2025, 6, 15, 12)),
]

# (partition spec, source col, transform for expected values, probe literal)
CASES = [
    ("s", "s", Transform("identity", "s"), "alpha"),
    ("n", "n", Transform("identity", "n"), 7),
    ("bucket(4, n)", "n", Transform("bucket", "n", 4), 13),
    ("bucket(8, s)", "s", Transform("bucket", "s", 8), "beta"),
    ("mbucket(4, n)", "n", Transform("mbucket", "n", 4), 13),
    ("mbucket(8, s)", "s", Transform("mbucket", "s", 8), "beta"),
    ("mbucket(16, ts)", "ts", Transform("mbucket", "ts", 16), dt.datetime(2023, 7, 21, 4)),
    ("truncate(10, n)", "n", Transform("truncate", "n", 10), 107),
    ("truncate(2, s)", "s", Transform("truncate", "s", 2), "gamble"),
    ("year(ts)", "ts", Transform("year", "ts"), dt.datetime(2023, 3, 5, 4)),
    ("month(ts)", "ts", Transform("month", "ts"), dt.datetime(2024, 1, 2, 23)),
    ("day(ts)", "ts", Transform("day", "ts"), dt.datetime(2023, 3, 5, 9)),
    ("hour(ts)", "ts", Transform("hour", "ts"), dt.datetime(2023, 3, 5, 4)),
]


@pytest.mark.parametrize("spec,src,tr,probe", CASES, ids=[c[0] for c in CASES])
def test_transform_write_prune_read(catalog, spark, spec, src, tr, probe):
    t = catalog.create_table(f"db.m_{abs(hash(spec))}", SCHEMA, partition_spec=[spec])
    t.append(spark.createDataFrame(ROWS, schema=t.schema))

    # roundtrip
    got = sorted(r["id"] for r in t.scan().select("id").collect())
    assert got == [1, 2, 3, 4, 5, 6]

    man = t.meta.read_manifest(t.meta.current_snapshot())
    pname = tr.partition_name
    assert all(pname in e.partition for e in man)
    distinct_pvals = {e.partition[pname] for e in man}
    assert len(distinct_pvals) >= 2  # rows actually spread over partitions

    # prune on the SOURCE column; expected partition value via Python face
    expected_pval = tr.apply(probe)
    pruned = t.prune(man, E.col_eq(src, probe))
    assert pruned, "probe value must land in some file"
    assert {e.partition[pname] for e in pruned} == {expected_pval}

    # read under the predicate returns exactly the matching rows
    want_ids = sorted(i for i, n, s, ts in ROWS if {"n": n, "s": s, "ts": ts}[src] == probe)
    got_ids = sorted(r["id"] for r in t.scan(E.col_eq(src, probe)).select("id").collect())
    assert got_ids == want_ids

    # NULL source rows live in a NULL partition and are scanable
    if src in ("n", "s"):
        assert sorted(
            r["id"] for r in t.scan(E.is_null(src)).select("id").collect()
        ) == [6]


def test_range_predicate_prunes_time_transforms(catalog, spark):
    """BETWEEN on the source timestamp prunes day-partitioned files via
    the inclusive transform projection (no file with a matching day may
    be dropped, files with disjoint days must be)."""
    t = catalog.create_table("db.m_range", SCHEMA, partition_spec=["day(ts)"])
    t.append(spark.createDataFrame(ROWS, schema=t.schema))
    man = t.meta.read_manifest(t.meta.current_snapshot())
    pruned = t.prune(
        man, E.between("ts", dt.datetime(2023, 3, 1), dt.datetime(2023, 12, 31))
    )
    days = {e.partition["ts_day"] for e in pruned}
    assert days == {20230305, 20230721}
    got = sorted(
        r["id"]
        for r in t.scan(
            E.between("ts", dt.datetime(2023, 3, 1), dt.datetime(2023, 12, 31))
        )
        .select("id")
        .collect()
    )
    assert got == [1, 2, 3]


def test_partition_evolution_without_rewrite(catalog, spark):
    """Reference README.md:52-58: spec changes apply to new writes only;
    both generations stay readable and prunable."""
    t = catalog.create_table("db.evolve", SCHEMA, partition_spec=["s"])
    t.append(spark.createDataFrame(ROWS[:3], schema=t.schema))
    files_gen1 = {e.path for e in t.meta.read_manifest(t.meta.current_snapshot())}

    t.update_partition_spec(["day(ts)"])
    t.append(spark.createDataFrame(ROWS[3:], schema=t.schema))

    man = t.meta.read_manifest(t.meta.current_snapshot())
    gen1 = [e for e in man if e.path in files_gen1]
    gen2 = [e for e in man if e.path not in files_gen1]
    assert gen1 and gen2
    assert all("s" in e.partition and "ts_day" not in e.partition for e in gen1)
    assert all("ts_day" in e.partition and "s" not in e.partition for e in gen2)

    # full read sees all six rows
    assert t.scan().count() == 6

    # prune on the NEW transform source: gen2 prunes by partition value,
    # gen1 is kept only if its ts column stats admit the predicate
    import datetime as dt

    pruned = t.prune(man, E.col_eq("ts", dt.datetime(2024, 1, 2, 23)))
    assert all(
        e.partition.get("ts_day") == 20240102 for e in pruned if e.path not in files_gen1
    )
    got = sorted(
        r["id"] for r in t.scan(E.col_eq("ts", dt.datetime(2024, 1, 2, 23))).select("id").collect()
    )
    assert got == [4]

    # prune on the OLD identity column: gen1 prunes by partition value,
    # gen2 by min/max column stats; rows still exact
    got = sorted(r["id"] for r in t.scan(E.col_eq("s", "alpha")).select("id").collect())
    assert got == [1]


def test_murmur3_iceberg_spec_vectors():
    """Pin the public Iceberg spec 'Appendix B' hash requirements — any
    Iceberg writer must produce these exact values, so matching them is
    bucket-layout interop."""
    from swiftlake_spark.tables.transforms import _mm3_serialize, murmur3_32

    def signed(u):
        return u - 2**32 if u >= 2**31 else u

    assert signed(murmur3_32(_mm3_serialize(34))) == 2017239379  # int & long
    assert signed(murmur3_32(_mm3_serialize("iceberg"))) == 1210000089
    assert signed(murmur3_32(_mm3_serialize(dt.date(2017, 11, 16)))) == -653330422
    ts = dt.datetime(2017, 11, 16, 22, 31, 8, tzinfo=dt.timezone.utc)
    assert signed(murmur3_32(_mm3_serialize(ts))) == -2047944441


def test_murmur3_spark_and_python_faces_agree(spark):
    """The Column face (masked bigint arithmetic, ANSI-safe) and the
    Python face must agree value-for-value — pruning correctness depends
    on it.  Sampled over negatives, boundaries, unicode and empty/odd-
    length strings (tail-block handling)."""
    import random

    from pyspark.sql import functions as F

    from swiftlake_spark.tables.transforms import Transform

    random.seed(11)
    longs = [0, -1, 34, -34, 2**62, -(2**62), 2**63 - 1, -(2**63)] + [
        random.randint(-(2**63), 2**63 - 1) for _ in range(32)
    ]
    tl = Transform("mbucket", "v", 32)
    df = spark.createDataFrame([(v,) for v in longs], "v BIGINT")
    got = [r[0] for r in df.select(tl.column("bigint")).collect()]
    assert got == [tl.apply(v) for v in longs]

    strs = ["", "a", "ab", "abc", "abcd", "abcde", "iceberg", "héllo wörld",
            "日本語テキスト", "x" * 137]
    ts_ = Transform("mbucket", "s", 8)
    df2 = spark.createDataFrame([(s,) for s in strs], "s STRING")
    got2 = [r[0] for r in df2.select(ts_.column("string")).collect()]
    assert got2 == [ts_.apply(s) for s in strs]


def test_murmur3_property_faces_agree(spark):
    """Property-based cross-check of the two murmur3 faces (hypothesis
    generates adversarial strings incl. multi-byte boundaries and longs
    at two's-complement edges)."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F

    from swiftlake_spark.tables.transforms import Transform

    tl = Transform("mbucket", "v", 64)
    ts_ = Transform("mbucket", "s", 64)

    collected_longs: list[int] = []
    collected_strs: list[str] = []

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def gather_longs(v):
        collected_longs.append(v)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=40))
    def gather_strs(s):
        collected_strs.append(s)

    gather_longs()
    gather_strs()

    df = spark.createDataFrame([(v,) for v in collected_longs], "v BIGINT")
    got = [r[0] for r in df.select(tl.column("bigint")).collect()]
    assert got == [tl.apply(v) for v in collected_longs]

    # Spark strings are UTF-8; surrogates can't round-trip — filter them
    clean = [s for s in collected_strs if not any(0xD800 <= ord(c) <= 0xDFFF for c in s)]
    df2 = spark.createDataFrame([(s,) for s in clean], "s STRING")
    got2 = [r[0] for r in df2.select(ts_.column("string")).collect()]
    assert got2 == [ts_.apply(s) for s in clean]


# -------------------------- partition path value encoding (reference
# PartitionedDataFileWriter.java:67-70,683-702: '#' escape, '#n' null,
# '#u' indirection for >150-char URL-encoded values)
def test_partition_value_encoding_null_empty_and_escapes(catalog, spark):
    t = catalog.create_table("db.penc", "id BIGINT, s STRING", partition_spec=["s"])
    vals = [
        (1, None),
        (2, ""),
        (3, "null"),
        (4, "NULL"),
        (5, "#weird"),
        (6, "#u" + "a" * 16),  # looks like a token — must round-trip via escape
        (7, "plain"),
    ]
    t.append(spark.createDataFrame(vals, schema=t.schema))
    man = t.meta.read_manifest(t.meta.current_snapshot())
    pvals = {e.partition["s"] for e in man}
    # every value round-trips through the path exactly — incl. "" (which
    # raw hive-style partitionBy collapses into NULL) and '#'-prefixed
    assert pvals == {None, "", "null", "NULL", "#weird", "#u" + "a" * 16, "plain"}

    # pruning on the decoded values stays exact
    for probe, want in [("", [2]), ("null", [3]), ("#weird", [5]), ("#u" + "a" * 16, [6])]:
        got = sorted(r["id"] for r in t.scan(E.col_eq("s", probe)).select("id").collect())
        assert got == want, probe
        pruned = t.prune(man, E.col_eq("s", probe))
        assert {e.partition["s"] for e in pruned} == {probe}
    assert sorted(r["id"] for r in t.scan(E.is_null("s")).select("id").collect()) == [1]


def test_partition_value_long_string_indirection(catalog, spark):
    """A >150-char partition value must not become a >150-char directory
    name: the PATH uses a deterministic '#u'+sha256 (full 64-hex) token (the
    reference mints '#u'+UUID) while the MANIFEST recovers the true
    value from the data file (≙ the reference's transformValueLookupMap)
    — so pruning stays exact and scans are unaffected."""
    t = catalog.create_table("db.plong", "id BIGINT, s STRING", partition_spec=["s"])
    long_a = "x" * 200
    long_b = "y" * 300
    t.append(spark.createDataFrame(
        [(1, long_a), (2, long_b), (3, "short")], schema=t.schema
    ))
    man = t.meta.read_manifest(t.meta.current_snapshot())
    # manifest holds TRUE values; only the directory name is tokenized
    assert {e.partition["s"] for e in man} == {long_a, long_b, "short"}
    import hashlib
    import os

    expect_tok = "#u" + hashlib.sha256(long_a.encode()).hexdigest()
    seen_dirs = set()
    for root, dirs, files in os.walk(t.location):
        for seg in dirs + files:
            assert len(seg.encode("utf-8")) <= 255
            seen_dirs.add(seg)
    import urllib.parse

    assert any(expect_tok in urllib.parse.unquote(seg) for seg in seen_dirs)

    # same value → same token dir across writes (deterministic digest)
    t.append(spark.createDataFrame([(4, long_a)], schema=t.schema))
    man2 = t.meta.read_manifest(t.meta.current_snapshot())
    assert sorted(
        e.partition["s"] for e in man2 if e.partition["s"] == long_a
    ) == [long_a, long_a]

    # equality filter on the long value returns exactly its rows, and
    # pruning is EXACT (manifest values are real, not tokens)
    got = sorted(r["id"] for r in t.scan(E.col_eq("s", long_a)).select("id").collect())
    assert got == [1, 4]
    pruned = t.prune(man2, E.col_eq("s", long_a))
    assert {e.partition["s"] for e in pruned} == {long_a}


def test_partition_value_encoding_property_roundtrip(catalog, spark):
    """Property: ANY list of distinct string partition values — unicode,
    path-hostile chars, '#'-prefixed, 'null'-alikes, empty, very long —
    round-trips through write → hive path → manifest decode, except
    >150-char values which map to their deterministic '#u' token.  One
    Spark write for the whole batch (a per-example write would be
    minutes); the VALUE SPACE is hypothesis-style adversarial but drawn
    deterministically so the test is stable."""
    import hashlib
    import urllib.parse

    from swiftlake_spark.tables.transforms import is_opaque_pvalue

    vals = [
        "",
        " ",
        "  leading and trailing  ",
        "#",
        "##",
        "#n",
        "#e",
        "#u" + "f" * 16,
        "null",
        "NULL",
        "Null",
        "nUlL",
        "a/b\\c",
        "a=b",
        "a%20b",
        "%",
        "a:b*c?d",
        "ünïcødé-πåñ€",
        "日本語テスト",
        "emoji 🎉🚀",
        "tab\tsep",
        "quote\"s'q",
        "[brackets]{braces}^caret",
        "__HIVE_DEFAULT_PARTITION__",  # Spark's own NULL sentinel
        "*" * 90,   # '*' is hive-escaped (3 bytes each) but NOT URL-encoded
        "*" * 40,
        "x" * 150,  # at the escaped-length boundary for ascii
        "x" * 151,  # just over
        "ü" * 60,   # 60 chars but URL-encodes to 360 chars → over
        "y" * 500,
    ]
    t = catalog.create_table("db.pprop", "id BIGINT, s STRING", partition_spec=["s"])
    rows_in = list(enumerate(vals))
    t.append(spark.createDataFrame(rows_in, schema=t.schema))
    man = t.meta.read_manifest(t.meta.current_snapshot())
    got = {e.partition["s"] for e in man}

    # manifests hold TRUE values for every input — >150-char values use a
    # '#u' token only in the directory name (recovered from the data file)
    assert got == set(vals)

    from swiftlake_spark.tables.transforms import hive_escaped_len_py

    def expected(v: str) -> str:  # the PATH-side encoding, for dir checks
        esc = (
            "#" + v
            if (v.startswith("#") or v.lower() == "null"
                or v == "__HIVE_DEFAULT_PARTITION__")
            else v
        )
        if hive_escaped_len_py(esc) > 150:
            return "#u" + hashlib.sha256(esc.encode()).hexdigest()
        return v
    # every encoded dir segment stays under the 255-byte filesystem bound
    import os

    for root, dirs, files in os.walk(t.location):
        for seg in dirs + files:
            assert len(seg.encode("utf-8")) <= 255
    # data correctness is independent of path encoding: every original
    # value scans back exactly, long ones included
    back = {(r["id"], r["s"]) for r in t.scan().collect()}
    assert back == set(rows_in)
    # equality pruning is exact for EVERY value — true manifest values
    # make even >150-char partitions exactly prunable
    from swiftlake_spark.tables import expressions as EE

    for v in vals:
        pruned = {e.partition["s"] for e in t.prune(man, EE.col_eq("s", v))}
        assert pruned == {v}, repr(v)
