"""Avro object-container-file codec conformance (sources/avro_codec.py).

Two proof layers:
1. pure-python roundtrips over every supported type, both codecs,
   multi-block containers, schema resolution, corruption detection;
2. a REFERENCE-IMPLEMENTATION fixture: tests/fixtures/
   java_avro_1.12.1.avro was written by org.apache.avro 1.12.1 (the
   avro jar pyspark ships; writer program recorded below) — reading
   it bit-exactly is the spec-compliance gate. The reverse direction
   (java reads OUR bytes) was verified once at build time with the
   same jar: DataFileReader consumed write_ocf() output for both
   null and deflate codecs with matching aggregates.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pudatalake_spark.sources import avro_codec as A

CUSTOMER = {
    "type": "record",
    "name": "customer",
    "fields": [
        {"name": "c_custkey", "type": "long"},
        {"name": "c_name", "type": "string"},
        {"name": "c_nationkey", "type": "int"},
        {"name": "c_acctbal", "type": "double"},
        {"name": "c_mktsegment", "type": ["null", "string"], "default": None},
    ],
}


def _customers(n=257, start=-5):
    return [
        {
            "c_custkey": i,
            "c_name": f"cust#{i}",
            "c_nationkey": i % 25,
            "c_acctbal": i * 1.25 - 3,
            "c_mktsegment": None if i % 7 == 0 else f"SEG{i % 3}",
        }
        for i in range(start, start + n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy", "bzip2", "xz"])
def test_roundtrip_both_codecs(codec):
    recs = _customers()
    blob = A.write_ocf(recs, CUSTOMER, codec=codec, block_records=100)
    schema, back = A.read_ocf(blob)
    assert back == recs
    assert schema["name"] == "customer"
    # multi-block layout: 257 records / 100 per block = 3 blocks
    blocks = list(A.iter_blocks(blob))
    assert [c for c, _ in blocks] == [100, 100, 57]


def test_blocks_decode_independently():
    """The sync-marker block is the SPLIT unit: each block must decode
    with no state from its predecessors (what lets a distributed
    reader fan one big container across tasks)."""
    recs = _customers(n=90)
    blob = A.write_ocf(recs, CUSTOMER, codec="deflate", block_records=30)
    out = []
    for count, payload in A.iter_blocks(blob):
        out.extend(A.decode_block(payload, count, CUSTOMER))
    assert out == recs


def test_split_plan_and_seek_read():
    """The full split contract: plan_splits reads only header +
    per-block varints; each (offset) then decodes independently via
    read_block_at — including OUT OF ORDER and in isolation, exactly
    how a distributed reader fans a multi-GB container across tasks.
    Also against the java-written fixture (foreign sync/offsets)."""
    recs = _customers(n=100)
    blob = A.write_ocf(recs, CUSTOMER, codec="deflate", block_records=40)
    splits = A.plan_splits(blob)
    assert [s["count"] for s in splits] == [40, 40, 20]
    # tasks read their split only, in reverse order
    out = []
    for s in reversed(splits):
        out = A.read_block_at(blob, s["offset"]) + out
    assert out == recs
    # reader-schema projection applies at the split level too
    reader = {"type": "record", "name": "customer", "fields": [
        {"name": "c_custkey", "type": "long"}]}
    only_keys = A.read_block_at(blob, splits[1]["offset"],
                                reader_schema=reader)
    assert only_keys == [{"c_custkey": r["c_custkey"]}
                         for r in recs[40:80]]
    # foreign container: java-written fixture splits the same way
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "java_avro_1.12.1.avro")
    jdata = open(path, "rb").read()
    jsplits = A.plan_splits(jdata)
    assert [s["count"] for s in jsplits] == [200, 200, 100]
    mid = A.read_block_at(jdata, jsplits[1]["offset"])
    assert len(mid) == 200
    assert mid[0]["id"] == 200 * 1000003 - 250  # first record of block 2
    assert mid[0]["name"] is None  # 200 % 5 == 0 -> null branch
    assert mid[1]["name"] == "row-201"


def test_all_primitive_and_complex_types():
    schema = {
        "type": "record",
        "name": "mixed",
        "fields": [
            {"name": "n", "type": "null"},
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "by", "type": "bytes"},
            {"name": "s", "type": "string"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "e", "type": {"type": "enum", "name": "Color",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "FP4",
                                    "size": 4}},
            {"name": "u", "type": ["null", "double"]},
        ],
    }
    recs = [
        {"n": None, "b": True, "i": -(2**31), "l": -(2**63),
         "f": 0.5, "d": 1e300, "by": b"\x00\xff", "s": "héllo ☃",
         "arr": [1, -2, 3], "m": {"k1": "v1", "k2": "v2"},
         "e": "GREEN", "fx": b"\x01\x02\x03\x04", "u": None},
        {"n": None, "b": False, "i": 2**31 - 1, "l": 2**63 - 1,
         "f": -2.25, "d": -1e-300, "by": b"", "s": "",
         "arr": [], "m": {}, "e": "BLUE", "fx": b"ABCD", "u": 3.14},
    ]
    _, back = A.read_ocf(A.write_ocf(recs, schema, codec="deflate"))
    assert back == recs


def test_zigzag_varint_extremes():
    for v in (0, -1, 1, 63, 64, -64, -65, 2**63 - 1, -(2**63)):
        buf = bytearray()
        A._write_long(buf, v)
        got, pos = A._read_long(bytes(buf), 0)
        assert (got, pos) == (v, len(buf)), v


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1)))
def test_varint_roundtrip_property(values):
    buf = bytearray()
    for v in values:
        A._write_long(buf, v)
    pos, out = 0, []
    data = bytes(buf)
    for _ in values:
        v, pos = A._read_long(data, pos)
        out.append(v)
    assert out == values and pos == len(data)


_REC_SCHEMA = {
    "type": "record", "name": "prop", "fields": [
        {"name": "k", "type": "long"},
        {"name": "x", "type": "double"},
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "b", "type": "bytes"},
    ],
}

_rec_st = st.fixed_dictionaries({
    "k": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "x": st.floats(allow_nan=False),  # NaN breaks == comparison only
    "s": st.none() | st.text(max_size=40),
    "arr": st.lists(st.integers(min_value=-(2**40), max_value=2**40),
                    max_size=8),
    "m": st.dictionaries(st.text(max_size=8),
                         st.integers(min_value=-100, max_value=100),
                         max_size=4),
    "b": st.binary(max_size=32),
})


@settings(max_examples=100, deadline=None)
@given(st.lists(_rec_st, max_size=25),
       st.sampled_from(["null", "deflate", "snappy", "bzip2", "xz"]),
       st.integers(min_value=1, max_value=7))
def test_record_roundtrip_property(recs, codec, block_records):
    """Arbitrary records (full int64 range, ±inf doubles, unicode,
    empty/nested containers), arbitrary block sizes, both codecs."""
    blob = A.write_ocf(recs, _REC_SCHEMA, codec=codec,
                       block_records=block_records)
    _, back = A.read_ocf(blob)
    assert back == recs


def test_schema_resolution_subset_reorder_default_promote():
    recs = _customers(n=10)
    reader = {
        "type": "record",
        "name": "customer",
        "fields": [
            {"name": "c_acctbal", "type": "double"},       # reorder
            {"name": "c_custkey", "type": "double"},       # long->double
            {"name": "c_nationkey", "type": "long"},       # int->long
            {"name": "c_region", "type": "string",
             "default": "UNKNOWN"},                        # reader-only
        ],
    }
    _, proj = A.read_ocf(A.write_ocf(recs, CUSTOMER), reader_schema=reader)
    assert proj[0] == {
        "c_acctbal": recs[0]["c_acctbal"],
        "c_custkey": float(recs[0]["c_custkey"]),
        "c_nationkey": recs[0]["c_nationkey"],
        "c_region": "UNKNOWN",
    }
    # string <-> bytes promotion both ways
    w = {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": "string"}]}
    r = {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": "bytes"}]}
    _, out = A.read_ocf(A.write_ocf([{"x": "abc"}], w), reader_schema=r)
    assert out == [{"x": b"abc"}]


def test_resolution_errors():
    w = {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": "double"}]}
    # double does not promote to long
    r_bad = {"type": "record", "name": "r",
             "fields": [{"name": "x", "type": "long"}]}
    blob = A.write_ocf([{"x": 1.5}], w)
    with pytest.raises(ValueError, match="does not resolve"):
        A.read_ocf(blob, reader_schema=r_bad)
    # reader-only field with no default
    r_missing = {"type": "record", "name": "r",
                 "fields": [{"name": "y", "type": "long"}]}
    with pytest.raises(ValueError, match="no default"):
        A.read_ocf(blob, reader_schema=r_missing)


def test_nullable_union_hops():
    """value <-> ["null", value] hops in BOTH directions — the
    add-a-nullable-column / tighten-to-required schema evolutions."""
    plain = {"type": "record", "name": "r",
             "fields": [{"name": "x", "type": "long"}]}
    nullable = {"type": "record", "name": "r",
                "fields": [{"name": "x", "type": ["null", "long"]}]}
    blob = A.write_ocf([{"x": 7}], plain)
    _, out = A.read_ocf(blob, reader_schema=nullable)
    assert out == [{"x": 7}]
    blob2 = A.write_ocf([{"x": 7}, {"x": None}], nullable)
    _, out2 = A.read_ocf(blob2, reader_schema=nullable)
    assert out2 == [{"x": 7}, {"x": None}]


def test_corruption_detected():
    blob = bytearray(A.write_ocf(_customers(n=50), CUSTOMER,
                                 codec="null", block_records=25))
    # flip a byte inside the FIRST sync marker (header is
    # magic+metadata; the marker follows it, then block 1)
    schema, codec, sync, pos = A._read_header(bytes(blob))
    blob[pos - 1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        list(A.iter_blocks(bytes(blob)))
    with pytest.raises(ValueError, match="magic"):
        A.read_ocf(b"NOPE" + bytes(blob[4:]))


def test_deterministic_output():
    recs = _customers(n=40)
    assert A.write_ocf(recs, CUSTOMER) == A.write_ocf(recs, CUSTOMER)


def test_empty_container():
    blob = A.write_ocf([], CUSTOMER, codec="deflate")
    schema, recs = A.read_ocf(blob)
    assert recs == [] and schema["name"] == "customer"


def test_logical_types_roundtrip():
    """date / timestamp-millis+micros / time-micros / decimal
    (bytes AND fixed) / uuid — the lake-interchange layer. Covers
    pre-epoch dates/timestamps and negative decimals (two's-complement
    unscaled encoding)."""
    import datetime
    import decimal
    import uuid

    schema = {"type": "record", "name": "lake", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts_us", "type": {"type": "long",
                                   "logicalType": "timestamp-micros"}},
        {"name": "ts_ms", "type": {"type": "long",
                                   "logicalType": "timestamp-millis"}},
        {"name": "t_us", "type": {"type": "long",
                                  "logicalType": "time-micros"}},
        {"name": "amount", "type": {"type": "bytes",
                                    "logicalType": "decimal",
                                    "precision": 12, "scale": 2}},
        {"name": "amount_fx", "type": {"type": "fixed", "name": "Dec8",
                                       "size": 8,
                                       "logicalType": "decimal",
                                       "precision": 18, "scale": 4}},
        {"name": "id", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "maybe_ts", "type": ["null", {
            "type": "long", "logicalType": "timestamp-micros"}]},
    ]}
    recs = [
        {"d": datetime.date(1998, 9, 2),
         "ts_us": datetime.datetime(2026, 8, 15, 12, 34, 56, 789012),
         "ts_ms": datetime.datetime(2026, 8, 15, 12, 34, 56, 789000),
         "t_us": datetime.time(23, 59, 59, 123456),
         "amount": decimal.Decimal("-12345.67"),
         "amount_fx": decimal.Decimal("99999999.1234"),
         "id": uuid.UUID("12345678-1234-5678-1234-567812345678"),
         "maybe_ts": None},
        {"d": datetime.date(1969, 12, 31),  # pre-epoch: negative days
         "ts_us": datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),
         "ts_ms": datetime.datetime(1960, 1, 1),
         "t_us": datetime.time(0, 0, 0),
         "amount": decimal.Decimal("0.01"),
         "amount_fx": decimal.Decimal("-0.0001"),
         "id": uuid.UUID(int=7),
         "maybe_ts": datetime.datetime(2000, 2, 29, 6, 0, 0)},
    ]
    for codec in ("null", "deflate"):
        _, back = A.read_ocf(A.write_ocf(recs, schema, codec=codec))
        assert back == recs, codec


def test_reads_reference_java_logical_avro_file():
    """Logical-type spec compliance vs org.apache.avro 1.12.1: the
    fixture was written by GenericDatumWriter under a logicalType-
    annotated schema (wire format = raw primitives; writer program:
    d=10471+i days, ts=1786451696789012+i*1e6 us, amount=unscaled
    int32 two's-complement of -1234567+i at scale 2, uuid string
    %012d of i, for i in 0..49, deflate)."""
    import datetime
    import decimal
    import uuid

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "java_avro_logical_1.12.1.avro")
    _, recs = A.read_ocf(open(path, "rb").read())
    assert len(recs) == 50
    assert recs[0]["d"] == datetime.date(1998, 9, 2)
    assert recs[1]["d"] == datetime.date(1998, 9, 3)
    assert recs[0]["ts"] == datetime.datetime(1970, 1, 1) + \
        datetime.timedelta(microseconds=1786451696789012)
    assert recs[0]["amount"] == decimal.Decimal("-12345.67")
    assert recs[49]["amount"] == decimal.Decimal("-12345.18")
    assert recs[7]["id"] == uuid.UUID(
        "00000000-0000-0000-0000-000000000007")


def test_reads_reference_java_avro_file():
    """Spec-compliance gate: a container written by org.apache.avro
    1.12.1 (DataFileWriter, deflate codec, explicit sync() splits at
    records 200/400 -> 3 blocks; all 11 supported types). Writer
    program: GenericDatumWriter over records
      id=i*1000003-250, flag=(i%3==0), small=(i%97)-48,
      ratio=i*0.25f, score=i*1e6/7.0,
      name=(null if i%5==0 else "row-"+i), payload=[i, i>>3, 0, 0xFF],
      tags=["t"+(i%4), "u"+(i%2)], props={a: i, b: -i},
      color=colors[i%3], fp=[1, 2, i, 4]   for i in 0..499.
    """
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "java_avro_1.12.1.avro")
    data = open(path, "rb").read()
    schema, recs = A.read_ocf(data)
    assert len(recs) == 500
    assert [c for c, _ in A.iter_blocks(data)] == [200, 200, 100]
    assert sum(r["id"] for r in recs) == sum(
        i * 1000003 - 250 for i in range(500)
    )
    assert recs[0]["name"] is None and recs[1]["name"] == "row-1"
    assert recs[7]["score"] == 7e6 / 7.0
    assert bytes(recs[7]["payload"]) == bytes([7, 0, 0, 0xFF])
    assert recs[7]["color"] == "GREEN"
    assert bytes(recs[7]["fp"]) == bytes([1, 2, 7, 4])
    assert recs[7]["tags"] == ["t3", "u1"]
    assert recs[7]["props"] == {"a": 7, "b": -7}
    # schema resolution works against foreign-written files too
    reader = {"type": "record", "name": "mixed", "fields": [
        {"name": "score", "type": "double"},
        {"name": "small", "type": "long"},
        {"name": "extra", "type": "string", "default": "dflt"}]}
    _, proj = A.read_ocf(data, reader_schema=reader)
    assert proj[3] == {"score": 3e6 / 7.0, "small": 3 - 48,
                       "extra": "dflt"}


# ------------------------------------------------------------- snappy (r10)

@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_snappy_raw_roundtrip_property(data):
    """Raw snappy block roundtrip over arbitrary bytes (the same
    property gate the deflate path gets via the record roundtrips)."""
    assert A._snappy_decompress(A._snappy_compress(data)) == data


def test_snappy_highly_repetitive_and_long_inputs():
    """Exercise every encoder element form: >64-byte matches (copy
    chunking with the >=4 tail rule), >60-byte literals (1- and
    2-byte length forms), and inputs past the 64 KiB offset window."""
    cases = [
        b"",
        b"a" * 70000,                       # long overlapping copies
        b"hello world, " * 5000,            # long non-overlapping copies
        bytes(range(256)) * 300,            # 61-byte+ literals, matches
        (b"\x00" * 65540) + b"unique-tail" + (b"\x00" * 65540),
    ]
    for c in cases:
        z = A._snappy_compress(c)
        assert A._snappy_decompress(z) == c
        # repetitive inputs must actually compress
        if len(c) > 1000 and len(set(c)) < 20:
            assert len(z) < len(c) // 4


def test_snappy_crc_and_truncation_detected():
    recs = _customers(n=80)
    blob = A.write_ocf(recs, CUSTOMER, codec="snappy", block_records=40)
    _, back = A.read_ocf(blob)
    assert back == recs
    # flip one byte inside block 2's compressed payload -> either the
    # snappy stream itself or the trailing CRC32 catches it
    splits = A.plan_splits(blob)
    bad = bytearray(blob)
    bad[splits[1]["offset"] + 4] ^= 0xFF
    with pytest.raises(ValueError, match="snappy"):
        A.read_ocf(bytes(bad))
    # a block shorter than its CRC suffix is rejected, not sliced
    with pytest.raises(ValueError, match="CRC"):
        A._snappy_block_decode(b"\x01")


def test_snappy_decoder_rejects_bad_copies():
    # copy(offset=1) before any output exists
    with pytest.raises(ValueError, match="offset"):
        A._snappy_decompress(bytes([4, (0 << 2) | 2, 1, 0]))
    # preamble promises more bytes than the elements produce
    with pytest.raises(ValueError, match="decoded"):
        A._snappy_decompress(bytes([9, (0 << 2), ord("x")]))


def test_reads_reference_java_snappy_avro_file():
    """tests/fixtures/java_avro_snappy_1.12.1.avro was written by
    org.apache.avro 1.12.1 + snappy-java 1.1.10.8 (the jars pyspark
    ships), codec=snappy, 300 records of {id: long, name:
    ["null","string"]} with id = i*7 and name null when i % 5 == 0
    (writer driven through py4j at r10 build time; the reverse
    direction - java DataFileReader consuming write_ocf(codec=
    "snappy") bytes - was verified in the same session, and the raw
    block layer is pinned live in test_snappy_java_interop)."""
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "java_avro_snappy_1.12.1.avro")
    data = open(path, "rb").read()
    schema, recs = A.read_ocf(data)
    assert len(recs) == 300
    assert recs[0] == {"id": 0, "name": None}
    assert recs[1] == {"id": 7, "name": "row-1"}
    assert recs[299] == {"id": 299 * 7, "name": "row-299"}
    assert sum(1 for r in recs if r["name"] is None) == 60


def test_snappy_java_interop(spark):
    """LIVE bidirectional raw-snappy interop against org.xerial.snappy
    (the snappy-java jar in pyspark's classpath, reached through the
    session JVM): java must uncompress our blocks, we must decompress
    java's - the same both-ways gate the deflate codec got from the
    java fixtures."""
    S = spark._jvm.org.xerial.snappy.Snappy
    import random

    rng = random.Random(11)
    cases = [
        b"a",
        b"hello world, " * 3000,
        bytes(rng.randrange(256) for _ in range(20000)),
        b"z" * 70000,
    ]
    for c in cases:
        assert bytes(S.uncompress(bytearray(A._snappy_compress(c)))) == c
        assert A._snappy_decompress(bytes(S.compress(bytearray(c)))) == c


# ------------------------------------------------- union hardening (r10)

def test_multibranch_union_selected_by_value_type():
    """ADVICE r9: unions beyond ["null", T] must encode by VALUE TYPE
    (first accepting branch), not first-non-null - a str against
    ["null","int","string"] previously died inside _write_long."""
    schema = {"type": "record", "name": "u", "fields": [
        {"name": "v", "type": ["null", "long", "string", "double"]}]}
    vals = [{"v": None}, {"v": 7}, {"v": "x"}, {"v": 2.5}, {"v": 3}]
    _, back = A.read_ocf(A.write_ocf(vals, schema, codec="deflate"))
    assert back == vals  # 3 stays the long branch, 2.5 the double
    # bool must NOT be swallowed by an int branch
    bschema = {"type": "record", "name": "b", "fields": [
        {"name": "v", "type": ["boolean", "long"]}]}
    _, bback = A.read_ocf(A.write_ocf(
        [{"v": True}, {"v": 1}], bschema))
    assert bback == [{"v": True}, {"v": 1}]
    assert bback[0]["v"] is True and bback[1]["v"] == 1
    # no branch accepts the value -> loud rejection at encode time
    with pytest.raises(ValueError, match="no union branch"):
        A.write_ocf([{"v": b"bytes"}], schema)


def test_multibranch_union_resolution():
    """Writer multi-branch union values must resolve to the matching
    reader branch by value type (the _resolve twin of the encode fix)."""
    w = {"type": "record", "name": "r", "fields": [
        {"name": "v", "type": ["null", "int", "string"]}]}
    r = {"type": "record", "name": "r", "fields": [
        {"name": "v", "type": ["null", "long", "string"]}]}
    blob = A.write_ocf([{"v": 5}, {"v": "s"}, {"v": None}], w)
    _, out = A.read_ocf(blob, reader_schema=r)
    assert out == [{"v": 5}, {"v": "s"}, {"v": None}]


# ------------------------------------------------- bzip2 / xz (r10)

def test_bzip2_xz_corruption_detected():
    """Both stdlib streams carry their own integrity checks (bzip2
    block CRCs, xz CRC64); a flipped byte inside block 2's payload
    must surface as the codec's ValueError, not silent junk."""
    for codec in ("bzip2", "xz"):
        recs = _customers(n=80)
        blob = A.write_ocf(recs, CUSTOMER, codec=codec, block_records=40)
        _, back = A.read_ocf(blob)
        assert back == recs
        splits = A.plan_splits(blob)
        bad = bytearray(blob)
        bad[splits[1]["offset"] + 8] ^= 0xFF
        with pytest.raises(ValueError):
            A.read_ocf(bytes(bad))


def test_bzip2_xz_java_interop(spark):
    """LIVE bidirectional block-layer interop against org.apache.avro
    1.12.1's own CodecFactory (bzip2 via commons-compress 1.28, xz via
    xz-java 1.10 - both jars in pyspark's classpath): java's avro
    codec must decompress our blocks, and our codec must decompress
    java's - the exact both-ways gate the snappy codec got."""
    jvm = spark._jvm
    import random

    rng = random.Random(13)
    cases = [
        b"a",
        b"hello avro, " * 3000,
        bytes(rng.randrange(256) for _ in range(20000)),
    ]
    factories = {
        "bzip2": jvm.org.apache.avro.file.CodecFactory.bzip2Codec(),
        "xz": jvm.org.apache.avro.file.CodecFactory.xzCodec(6),
    }
    for name, factory in factories.items():
        codec = factory.createInstance()
        for c in cases:
            ours = A._block_decode  # decode path under test
            # our compressed stream -> java decompress
            if name == "bzip2":
                import bz2 as _bz2
                comp = _bz2.compress(c, 9)
            else:
                import lzma as _lzma
                comp = _lzma.compress(c, format=_lzma.FORMAT_XZ, preset=6)
            bb = jvm.java.nio.ByteBuffer.wrap(bytearray(comp))
            out = codec.decompress(bb)
            assert bytes(out.array()[out.position():out.limit()]) == c
            # java's compressed stream -> our decode
            jin = jvm.java.nio.ByteBuffer.wrap(bytearray(c))
            jcomp = codec.compress(jin)
            jbytes = bytes(jcomp.array()[jcomp.position():jcomp.limit()])
            assert ours(name, jbytes) == c
