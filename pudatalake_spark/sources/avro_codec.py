"""Pure-stdlib Apache Avro object-container-file codec (SURVEY §2.1).

This build ships the avro core/ipc/mapred jars but NOT
``spark-avro_2.13``, so ``spark.read.format("avro")`` is unavailable
(probed every round since r5 — BASELINE.md). The format itself is
fully public (Avro 1.12 specification); this module implements the
subset a lake interchange path needs with nothing beyond the standard
library — the same discipline as ``llmops/codecs.py`` (PNG/WAV/netpbm):

- **binary encoding**: null / boolean / int / long (zigzag varint),
  float / double (little-endian IEEE), bytes / string
  (length-prefixed), fixed, enum (index), array / map (blocked, with
  the optional negative-count + byte-size form on read), union
  (branch index), record (fields in declared order), named-type
  references.
- **object container file**: magic ``Obj\\x01``, file-metadata map
  (``avro.schema`` + ``avro.codec``), 16-byte sync marker, then
  blocks of (record-count, byte-size, payload, sync). Codecs ``null``,
  ``deflate`` (raw RFC1951 — ``zlib`` with ``wbits=-15``),
  ``snappy`` (r10: raw snappy block format implemented here in pure
  stdlib — LE-varint preamble, literal/copy tags — plus the Avro
  4-byte big-endian CRC32-of-uncompressed suffix; cross-validated
  bidirectionally against the ``snappy-java`` jar pyspark ships),
  ``bzip2`` and ``xz`` (r10: standard .bz2 / .xz streams straight
  from the stdlib ``bz2`` / ``lzma`` modules, per the spec). Of the
  spec codecs only ``zstandard`` stays gated (no stdlib zstd).
- **schema resolution** (reader schema != writer schema): record
  fields matched by NAME (reorder/subset both work), writer-only
  fields decoded-and-dropped (Avro has no per-field lengths — skipping
  requires decoding), reader-only fields take their declared default,
  promotions int→long/float/double, long→float/double, float→double,
  string↔bytes, and value↔``["null", value]`` union hops.
- **logical types** (the lake-interchange layer): ``date``
  (int days ↔ ``datetime.date``), ``timestamp-millis`` /
  ``timestamp-micros`` (long ↔ naive-UTC ``datetime.datetime``, the
  engine's session-UTC convention), ``time-millis``/``time-micros``
  (int/long ↔ ``datetime.time``), ``decimal`` (bytes/fixed
  two's-complement unscaled ↔ ``decimal.Decimal`` at the declared
  scale), ``uuid`` (string ↔ ``uuid.UUID``). Unknown logical types
  fall back to the underlying primitive per the spec.

Scale shape: the sync-marker block structure is what makes real Avro
splittable — a reader seeks past the next sync and starts on a block
boundary, so one 1 GB container file fans out across tasks.
``iter_blocks``/``decode_block`` expose exactly that unit here; the
``src_avro`` ingest key (sources/ingest.py) runs this codec INSIDE
Arrow-batched ``mapInPandas`` workers (encode and decode both happen
on executors, one container per partition — bytes never visit the
driver).

No reference file to cite: ``/root/reference`` is empty (SURVEY §0);
the behavior contract is the public Avro 1.12 spec.
"""

from __future__ import annotations

import bz2
import hashlib
import io
import json
import lzma
import struct
import zlib
from collections.abc import Iterable, Iterator

MAGIC = b"Obj\x01"

PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
              "bytes", "string"}

#: writer type -> reader types it may promote to (Avro 1.12 §Schema
#: Resolution), beyond exact match.
PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


# ------------------------------------------------------------------ varint

def _write_long(buf: bytearray, n: int) -> None:
    """Zigzag + base-128 varint (Avro int and long share this)."""
    n = int(n)
    u = (n << 1) ^ (n >> 63)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    """Bounded varint read (ADVICE r9): truncated input raises the
    codec's ValueError convention instead of IndexError, and a varint
    longer than 10 bytes (the 64-bit maximum) is rejected the way
    real Avro readers reject it, so corrupt data fails loudly at the
    decode site rather than as a confusing >64-bit value downstream."""
    acc = shift = 0
    try:
        while True:
            b = data[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 63:
                raise ValueError("avro: varint exceeds 10 bytes (corrupt)")
    except IndexError:
        raise ValueError("avro: truncated input") from None
    return (acc >> 1) ^ -(acc & 1), pos


# ------------------------------------------------------------------ schema

def parse_schema(schema) -> object:
    """Accept a JSON string or an already-parsed schema; normalize
    ``{"type": "string"}`` wrappers down to the bare primitive name."""
    if isinstance(schema, str) and schema not in PRIMITIVES:
        schema = json.loads(schema)
    if isinstance(schema, dict) and set(schema) == {"type"} and (
        schema["type"] in PRIMITIVES
    ):
        return schema["type"]
    return schema


def _schema_type(schema, names: dict) -> object:
    """Resolve named-type references and return the concrete schema."""
    if isinstance(schema, str):
        if schema in PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise ValueError(f"avro: unknown type reference {schema!r}")
    return schema


def _register_named(schema, names: dict) -> None:
    """First pass: record every named type so later references resolve."""
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            names[schema["name"]] = schema
        if t == "record":
            for f in schema["fields"]:
                _register_named(f["type"], names)
        elif t == "array":
            _register_named(schema["items"], names)
        elif t == "map":
            _register_named(schema["values"], names)
    elif isinstance(schema, list):
        for branch in schema:
            _register_named(branch, names)


# -------------------------------------------------------- logical types

def _logical_encode(schema: dict, value):
    """Python value -> underlying primitive value, per logicalType.
    Returns the value unchanged for unknown logical types (spec rule:
    fall back to the underlying type)."""
    import datetime
    import decimal as _dec
    import uuid as _uuid

    lt = schema.get("logicalType")
    if lt == "date" and isinstance(value, datetime.date):
        return (value - datetime.date(1970, 1, 1)).days
    if lt in ("timestamp-millis", "timestamp-micros") and isinstance(
        value, datetime.datetime
    ):
        if value.tzinfo is not None:
            value = value.astimezone(datetime.timezone.utc).replace(
                tzinfo=None
            )
        delta = value - datetime.datetime(1970, 1, 1)
        us = (delta.days * 86_400_000_000
              + delta.seconds * 1_000_000 + delta.microseconds)
        return us // 1000 if lt == "timestamp-millis" else us
    if lt in ("time-millis", "time-micros") and isinstance(
        value, datetime.time
    ):
        us = (value.hour * 3600 + value.minute * 60
              + value.second) * 1_000_000 + value.microsecond
        return us // 1000 if lt == "time-millis" else us
    if lt == "decimal" and isinstance(value, _dec.Decimal):
        scale = schema.get("scale", 0)
        unscaled = int(value.scaleb(scale).to_integral_value())
        n = max(1, (unscaled.bit_length() + 8) // 8)
        if schema["type"] == "fixed":
            n = schema["size"]
        return unscaled.to_bytes(n, "big", signed=True)
    if lt == "uuid" and isinstance(value, _uuid.UUID):
        return str(value)
    return value


def _logical_decode(schema: dict, value):
    """Underlying primitive value -> Python value, per logicalType."""
    import datetime
    import decimal as _dec
    import uuid as _uuid

    lt = schema.get("logicalType")
    if lt is None:
        return value
    if lt == "date":
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=value)
    if lt in ("timestamp-millis", "timestamp-micros"):
        us = value * 1000 if lt == "timestamp-millis" else value
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=us
        )
    if lt in ("time-millis", "time-micros"):
        us = value * 1000 if lt == "time-millis" else value
        return (datetime.datetime(1970, 1, 1)
                + datetime.timedelta(microseconds=us)).time()
    if lt == "decimal":
        unscaled = int.from_bytes(bytes(value), "big", signed=True)
        return _dec.Decimal(unscaled).scaleb(-schema.get("scale", 0))
    if lt == "uuid":
        return _uuid.UUID(value)
    return value  # unknown logical type: underlying primitive


# ------------------------------------------------------------------ encode

def _encode(schema, value, buf: bytearray, names: dict) -> None:
    schema = _schema_type(schema, names)
    if isinstance(schema, list):  # union: branch index then value
        idx = _union_branch(schema, value, names)
        _write_long(buf, idx)
        _encode(schema[idx], value, buf, names)
        return
    if isinstance(schema, dict):
        if "logicalType" in schema:
            value = _logical_encode(schema, value)
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], value[f["name"]], buf, names)
        elif t == "array":
            value = list(value)
            if value:
                _write_long(buf, len(value))
                for item in value:
                    _encode(schema["items"], item, buf, names)
            _write_long(buf, 0)
        elif t == "map":
            if value:
                _write_long(buf, len(value))
                for k, v in value.items():
                    _encode("string", k, buf, names)
                    _encode(schema["values"], v, buf, names)
            _write_long(buf, 0)
        elif t == "enum":
            buf_idx = schema["symbols"].index(value)
            _write_long(buf, buf_idx)
        elif t == "fixed":
            raw = bytes(value)
            if len(raw) != schema["size"]:
                raise ValueError(
                    f"avro: fixed {schema['name']} wants {schema['size']}"
                    f" bytes, got {len(raw)}"
                )
            buf.extend(raw)
        else:
            _encode(t, value, buf, names)
        return
    # primitives (schema is a str)
    if schema == "null":
        if value is not None:
            raise ValueError("avro: non-None value for null type")
    elif schema == "boolean":
        buf.append(1 if value else 0)
    elif schema in ("int", "long"):
        _write_long(buf, value)
    elif schema == "float":
        buf.extend(struct.pack("<f", float(value)))
    elif schema == "double":
        buf.extend(struct.pack("<d", float(value)))
    elif schema == "bytes":
        raw = bytes(value)
        _write_long(buf, len(raw))
        buf.extend(raw)
    elif schema == "string":
        raw = str(value).encode("utf-8")
        _write_long(buf, len(raw))
        buf.extend(raw)
    else:
        raise ValueError(f"avro: cannot encode type {schema!r}")


def _branch_accepts(schema, value, names: dict) -> bool:
    """Does this union branch's type accept the Python value? The
    writer-side type dispatch the Avro spec leaves to the library
    (java uses the datum's runtime class the same way). Records
    additionally require every field name present so two record
    branches disambiguate on shape."""
    import datetime
    import decimal as _dec
    import uuid as _uuid

    schema = _schema_type(schema, names)
    if isinstance(schema, list):  # nested unions are illegal in Avro
        return False
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            return isinstance(value, datetime.date) and not isinstance(
                value, datetime.datetime
            )
        if lt in ("timestamp-millis", "timestamp-micros"):
            return isinstance(value, datetime.datetime)
        if lt in ("time-millis", "time-micros"):
            return isinstance(value, datetime.time)
        if lt == "decimal":
            return isinstance(value, _dec.Decimal)
        if lt == "uuid":
            return isinstance(value, _uuid.UUID)
        t = schema["type"]
        if t == "record":
            return isinstance(value, dict) and all(
                f["name"] in value for f in schema["fields"]
            )
        if t == "array":
            return isinstance(value, (list, tuple))
        if t == "map":
            return isinstance(value, dict)
        if t == "enum":
            return isinstance(value, str) and value in schema["symbols"]
        if t == "fixed":
            return isinstance(value, (bytes, bytearray)) and len(
                bytes(value)
            ) == schema["size"]
        return _branch_accepts(t, value, names)
    if schema == "null":
        return value is None
    if schema == "boolean":
        return isinstance(value, bool)
    if schema in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if schema in ("float", "double"):
        # ints are accepted (1 is a fine double) but an int/long
        # branch earlier in the union wins by first-match order.
        return isinstance(value, (int, float)) and not isinstance(
            value, bool
        )
    if schema == "bytes":
        return isinstance(value, (bytes, bytearray))
    if schema == "string":
        return isinstance(value, str)
    return False


def _union_branch(union: list, value, names: dict) -> int:
    """Pick the union branch for a Python value BY VALUE TYPE (first
    accepting branch wins, the java writer's dispatch order). r9
    shipped first-non-null, which mis-encoded any union beyond the
    ``["null", T]`` shape (ADVICE r9: a str against
    ["null","int","string"] hit int('x') deep in _write_long)."""
    for i, branch in enumerate(union):
        if _branch_accepts(branch, value, names):
            return i
    raise ValueError(f"avro: no union branch for {value!r} in {union}")


# ------------------------------------------------------------------ decode

def _decode(schema, data: bytes, pos: int, names: dict) -> tuple[object, int]:
    schema = _schema_type(schema, names)
    if isinstance(schema, list):
        idx, pos = _read_long(data, pos)
        return _decode(schema[idx], data, pos, names)
    if isinstance(schema, dict):
        t = schema["type"]
        if "logicalType" in schema and t not in ("record", "array", "map"):
            value, pos = (
                (data[pos:pos + schema["size"]], pos + schema["size"])
                if t == "fixed"
                else _decode(t, data, pos, names)
            )
            return _logical_decode(schema, value), pos
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = _decode(f["type"], data, pos, names)
            return rec, pos
        if t in ("array", "map"):
            out = [] if t == "array" else {}
            while True:
                n, pos = _read_long(data, pos)
                if n == 0:
                    break
                if n < 0:  # negative count: a byte size follows (skippable form)
                    n = -n
                    _, pos = _read_long(data, pos)
                for _ in range(n):
                    if t == "array":
                        item, pos = _decode(schema["items"], data, pos, names)
                        out.append(item)
                    else:
                        k, pos = _decode("string", data, pos, names)
                        v, pos = _decode(schema["values"], data, pos, names)
                        out[k] = v
            return out, pos
        if t == "enum":
            idx, pos = _read_long(data, pos)
            return schema["symbols"][idx], pos
        if t == "fixed":
            size = schema["size"]
            return data[pos:pos + size], pos + size
        return _decode(t, data, pos, names)
    if schema == "null":
        return None, pos
    if schema == "boolean":
        return data[pos] != 0, pos + 1
    if schema in ("int", "long"):
        return _read_long(data, pos)
    if schema == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if schema == "bytes":
        n, pos = _read_long(data, pos)
        return data[pos:pos + n], pos + n
    if schema == "string":
        n, pos = _read_long(data, pos)
        return data[pos:pos + n].decode("utf-8"), pos + n
    raise ValueError(f"avro: cannot decode type {schema!r}")


# --------------------------------------------------------- schema resolution

def _base_type(schema, names: dict):
    schema = _schema_type(schema, names)
    if isinstance(schema, dict):
        return schema["type"]
    return schema


def _resolve(writer, reader, value, wnames: dict, rnames: dict):
    """Adapt a value decoded with the WRITER schema to the READER
    schema: field match by name, reader defaults, promotions,
    value<->nullable-union hops. Raises on incompatible types."""
    w, r = _schema_type(writer, wnames), _schema_type(reader, rnames)
    # Union hops: writer union collapses to the value's branch
    # (matched by VALUE TYPE, r10 - first-non-null mis-resolved
    # multi-branch unions); for a reader union, resolve against its
    # first compatible branch.
    if isinstance(w, list):
        branch = w[_union_branch(w, value, wnames)]
        return _resolve(branch, r, value, wnames, rnames)
    if isinstance(r, list):
        if value is None and any(
            _base_type(b, rnames) == "null" for b in r
        ):
            return None
        for b in r:
            if _base_type(b, rnames) == "null":
                continue
            try:
                return _resolve(w, b, value, wnames, rnames)
            except (ValueError, TypeError):
                continue
        raise ValueError(f"avro: no reader union branch accepts {w!r}")
    wt, rt = _base_type(w, wnames), _base_type(r, rnames)
    if wt == "record":
        if rt != "record":
            raise ValueError(f"avro: record -> {rt} is not resolvable")
        out = {}
        wfields = {f["name"] for f in w["fields"]}
        by_name = {f["name"]: f for f in w["fields"]}
        for rf in r["fields"]:
            name = rf["name"]
            if name in wfields:
                out[name] = _resolve(
                    by_name[name]["type"], rf["type"], value[name],
                    wnames, rnames,
                )
            elif "default" in rf:
                out[name] = rf["default"]
            else:
                raise ValueError(
                    f"avro: reader field {name!r} missing from writer "
                    "schema and has no default"
                )
        return out
    if wt == "array":
        return [_resolve(w["items"], r["items"], v, wnames, rnames)
                for v in value]
    if wt == "map":
        return {k: _resolve(w["values"], r["values"], v, wnames, rnames)
                for k, v in value.items()}
    if wt == rt:
        return value
    if rt in PROMOTIONS.get(wt, ()):  # int->long/float/double etc.
        if rt in ("float", "double"):
            return float(value)
        if rt == "long":
            return int(value)
        if rt == "bytes":
            return value.encode("utf-8")
        if rt == "string":
            return bytes(value).decode("utf-8")
    raise ValueError(f"avro: writer {wt} does not resolve to reader {rt}")


# ------------------------------------------------------------------ snappy
#
# Raw snappy BLOCK format (google/snappy format_description.txt, also
# pure-public): LE base-128 varint of the uncompressed length, then
# tagged elements - literals (tag&3==0, length in the tag or 1-4
# trailing LE bytes) and back-references (tag&3 in 1/2/3: 1-byte
# offset-hi-in-tag, 2-byte LE offset, 4-byte LE offset). Avro's
# "snappy" codec wraps each compressed block with a 4-byte BIG-endian
# CRC32 of the UNCOMPRESSED payload (Avro 1.12 spec, Required Codecs).
# The decoder below handles every legal element; the encoder is a
# conservative greedy matcher (4-byte hash table, 2-byte-offset
# copies only, 64 KiB window) - every output is legal snappy that
# org.xerial.snappy round-trips (pinned bidirectionally in
# tests/test_avro_codec.py via the snappy-java jar pyspark ships).


def _snappy_decompress(data: bytes) -> bytes:
    n = shift = 0
    pos = 0
    try:
        while True:
            b = data[pos]
            pos += 1
            n |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 32:
                raise ValueError("snappy: preamble varint too long")
    except IndexError:
        raise ValueError("snappy: truncated preamble") from None
    out = bytearray()
    end = len(data)
    while pos < end:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:  # 61..64 -> length-1 in 1..4 trailing LE bytes
                nb = ln - 60
                ln = int.from_bytes(data[pos:pos + nb], "little") + 1
                pos += nb
            if pos + ln > end:
                raise ValueError("snappy: literal overruns input")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 4..11 bytes, 11-bit offset
            ln = 4 + ((tag >> 2) & 0x7)
            if pos >= end:
                raise ValueError("snappy: truncated copy")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 1..64 bytes, 16-bit LE offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 1..64 bytes, 32-bit LE offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        if off >= ln:  # non-overlapping: one slice
            start = len(out) - off
            out += out[start:start + ln]
        else:  # overlapping copy repeats recent bytes - byte-wise
            for _ in range(ln):
                out.append(out[-off])
    if len(out) != n:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble said {n}"
        )
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    out = bytearray()
    n = len(data)
    u = n
    while True:  # preamble: uncompressed length, LE base-128 varint
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            break

    def emit_literal(lo: int, hi: int) -> None:
        while lo < hi:
            ln = min(hi - lo, 65536)
            lm1 = ln - 1
            if lm1 < 60:
                out.append(lm1 << 2)
            elif lm1 < 256:
                out.append(60 << 2)
                out.append(lm1)
            else:
                out.append(61 << 2)
                out.extend(lm1.to_bytes(2, "little"))
            out.extend(data[lo:lo + ln])
            lo += ln

    def emit_copy(off: int, ln: int) -> None:
        # 2-byte-offset form only (len 1..64); long matches chunk so
        # the tail chunk stays >= 4 (reference-encoder convention).
        while ln >= 68:
            out.append((63 << 2) | 2)
            out.extend(off.to_bytes(2, "little"))
            ln -= 64
        if ln > 64:
            out.append((59 << 2) | 2)
            out.extend(off.to_bytes(2, "little"))
            ln -= 60
        out.append(((ln - 1) << 2) | 2)
        out.extend(off.to_bytes(2, "little"))

    table: dict[bytes, int] = {}
    i = lit_start = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF:
            k = 4
            while i + k < n and data[j + k] == data[i + k]:
                k += 1
            emit_literal(lit_start, i)
            emit_copy(i - j, k)
            i += k
            lit_start = i
        else:
            i += 1
    emit_literal(lit_start, n)
    return bytes(out)


def _snappy_block_encode(payload: bytes) -> bytes:
    """Avro snappy block = raw snappy + 4-byte BE CRC32 of the
    UNCOMPRESSED bytes."""
    return _snappy_compress(payload) + struct.pack(
        ">I", zlib.crc32(payload) & 0xFFFFFFFF
    )


def _snappy_block_decode(block: bytes) -> bytes:
    if len(block) < 4:
        raise ValueError("avro: snappy block shorter than its CRC")
    payload = _snappy_decompress(block[:-4])
    want = struct.unpack(">I", block[-4:])[0]
    got = zlib.crc32(payload) & 0xFFFFFFFF
    if want != got:
        raise ValueError(
            f"avro: snappy CRC mismatch (got {got:#010x}, "
            f"want {want:#010x})"
        )
    return payload


def _block_decode(codec: str, payload: bytes) -> bytes:
    if codec == "null":
        return payload
    if codec == "deflate":
        return zlib.decompress(payload, -15)
    if codec == "snappy":
        return _snappy_block_decode(payload)
    if codec == "bzip2":  # standard .bz2 stream per the spec
        try:
            return bz2.decompress(payload)
        except OSError as e:
            raise ValueError(f"avro: bad bzip2 block ({e})") from e
    if codec == "xz":  # standard .xz container per the spec
        try:
            return lzma.decompress(payload, format=lzma.FORMAT_XZ)
        except lzma.LZMAError as e:
            raise ValueError(f"avro: bad xz block ({e})") from e
    # "zstandard" is the one spec codec left out: no stdlib zstd in
    # this Python (probed r10, re-probed r11/r12: zstandard/zstd/
    # cramjam and py3.14's compression.zstd all absent on 3.11.7);
    # gate rather than vendor a compressor.
    raise NotImplementedError(f"avro: codec {codec!r}")


# ------------------------------------------------------------- container

def _sync_for(schema) -> bytes:
    """Deterministic 16-byte sync marker derived from the schema (the
    spec says 'randomly-generated'; deterministic keeps the lake's
    byte output reproducible across runs — same move as the seeded
    hashes in SURVEY §5.2)."""
    return hashlib.md5(
        b"pudatalake-avro:" + json.dumps(schema, sort_keys=True).encode()
    ).digest()


def write_ocf(records: Iterable[dict], schema, codec: str = "deflate",
              block_records: int = 1000) -> bytes:
    """Serialize records to one Avro object-container-file blob."""
    schema = parse_schema(schema)
    if codec not in ("null", "deflate", "snappy", "bzip2", "xz"):
        raise NotImplementedError(
            f"avro: codec {codec!r} (null/deflate/snappy/bzip2/xz only)"
        )
    names: dict = {}
    _register_named(schema, names)
    sync = _sync_for(schema)
    out = io.BytesIO()
    out.write(MAGIC)
    header = bytearray()
    meta = {"avro.schema": json.dumps(schema, sort_keys=True).encode(),
            "avro.codec": codec.encode()}
    _write_long(header, len(meta))
    for k, v in sorted(meta.items()):
        _encode("string", k, header, names)
        _encode("bytes", v, header, names)
    _write_long(header, 0)
    out.write(bytes(header))
    out.write(sync)

    block = bytearray()
    count = 0

    def _flush():
        nonlocal block, count
        if not count:
            return
        payload = bytes(block)
        if codec == "deflate":  # raw RFC1951 per the spec
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        elif codec == "snappy":  # raw snappy + BE CRC32 of raw bytes
            payload = _snappy_block_encode(payload)
        elif codec == "bzip2":  # standard .bz2 stream per the spec
            payload = bz2.compress(payload, 9)
        elif codec == "xz":  # standard .xz container per the spec
            payload = lzma.compress(payload, format=lzma.FORMAT_XZ, preset=6)
        head = bytearray()
        _write_long(head, count)
        _write_long(head, len(payload))
        out.write(bytes(head))
        out.write(payload)
        out.write(sync)
        block, count = bytearray(), 0

    for rec in records:
        _encode(schema, rec, block, names)
        count += 1
        if count >= block_records:
            _flush()
    _flush()
    return out.getvalue()


def _read_header(data: bytes) -> tuple[object, str, bytes, int]:
    """-> (writer_schema, codec, sync, first_block_pos)."""
    if data[:4] != MAGIC:
        raise ValueError("avro: bad container magic")
    meta: dict[str, bytes] = {}
    pos = 4
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _read_long(data, pos)
        for _ in range(n):
            k, pos = _decode("string", data, pos, {})
            v, pos = _decode("bytes", data, pos, {})
            meta[k] = v
    schema = parse_schema(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = data[pos:pos + 16]
    return schema, codec, sync, pos + 16


def iter_blocks(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (record_count, decompressed_payload) per container block —
    the split unit a distributed reader parallelizes over."""
    for count, payload, _off in iter_blocks_with_offsets(data):
        yield count, payload


def iter_blocks_with_offsets(
    data: bytes,
) -> Iterator[tuple[int, bytes, int]]:
    """Like ``iter_blocks`` but also yields each block's BYTE OFFSET —
    the handle a distributed reader ships to tasks so each task seeks
    straight to its block (see ``read_block_at``). This pair is what
    makes one multi-GB container fan out across executors at 100 TB:
    split planning reads only (count, size) varints per block, never
    the payloads."""
    schema, codec, sync, pos = _read_header(data)
    while pos < len(data):
        start = pos
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        payload = data[pos:pos + size]
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
        pos += 16
        yield count, _block_decode(codec, payload), start


def plan_splits(data: bytes) -> list[dict]:
    """Split planning without touching payloads: -> one dict per block
    ``{offset, count, size}`` (offset of the count varint; size =
    compressed payload bytes). A real reader runs this over just the
    header + per-block varints (seekable input); here the fixture is
    already in memory."""
    schema, codec, sync, pos = _read_header(data)
    out = []
    while pos < len(data):
        start = pos
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
        pos += 16
        out.append({"offset": start, "count": count, "size": size})
    return out


def read_block_at(data: bytes, offset: int, writer_schema=None,
                  reader_schema=None) -> list[dict]:
    """Decode ONE block given its byte offset, with NO state from
    predecessor blocks — the task-side half of the split contract
    (``plan_splits`` is the planner-side half). ``writer_schema``
    defaults to the container header's schema."""
    schema, codec, sync, _ = _read_header(data)
    if writer_schema is None:
        writer_schema = schema
    pos = offset
    count, pos = _read_long(data, pos)
    size, pos = _read_long(data, pos)
    payload = data[pos:pos + size]
    if data[pos + size:pos + size + 16] != sync:
        raise ValueError("avro: sync marker mismatch at split offset")
    return decode_block(
        _block_decode(codec, payload), count, writer_schema, reader_schema
    )


def decode_block(payload: bytes, count: int, writer_schema,
                 reader_schema=None) -> list[dict]:
    """Decode one decompressed block independently (split-level unit)."""
    writer_schema = parse_schema(writer_schema)
    wnames: dict = {}
    _register_named(writer_schema, wnames)
    rnames: dict = {}
    if reader_schema is not None:
        reader_schema = parse_schema(reader_schema)
        _register_named(reader_schema, rnames)
    out, pos = [], 0
    for _ in range(count):
        rec, pos = _decode(writer_schema, payload, pos, wnames)
        if reader_schema is not None:
            rec = _resolve(writer_schema, reader_schema, rec, wnames, rnames)
        out.append(rec)
    if pos != len(payload):
        raise ValueError("avro: trailing bytes after last record in block")
    return out


def read_ocf(data: bytes, reader_schema=None) -> tuple[object, list[dict]]:
    """Deserialize a whole container; -> (writer_schema, records).
    ``reader_schema`` activates schema resolution (subset/reorder/
    default-fill/promotions)."""
    schema, _, _, _ = _read_header(data)
    records: list[dict] = []
    for count, payload in iter_blocks(data):
        records.extend(decode_block(payload, count, schema, reader_schema))
    return schema, records
