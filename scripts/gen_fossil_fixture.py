#!/usr/bin/env python3
"""Generate committed fossil on-disk fixtures for FossilImportSpec.

Independent (Python) implementation of the byte formats the Scala reader
consumes, so the format is pinned from two sides without a Go toolchain:

  - Go `encoding/gob` wire format (public spec, encoding/gob/doc.go):
    varint-style unsigned ints, complement-shifted signed ints,
    length-delimited messages, negated type ids for definitions,
    delta-encoded struct fields with zero omission, a zero "delta" before
    non-struct top-level values.
  - fossil v2 layout (reference pkg/database/db.go:139-241): metadata
    (3 LE uint32 + RFC3339), gob segment files, zlib/JSON topic+schema
    tables, and a wal.log of `<action>;<base64(gob)>` lines
    (pkg/database/log.go) with corrupt lines planted to pin the
    skip-and-salvage semantics.
  - fossil v1 layout (pkg/database/migration.go:47-72): one gob
    `database` file.
  - time.Time GobEncode payload (time.Time.MarshalBinary, version 1):
    1 version byte, 8-byte BE seconds since year 1, 4-byte BE nanos,
    2-byte BE zone offset minutes (-1 = UTC).

Output: src/test/resources/fossil/{v2,v1,walonly}/ plus expected.tsv
files (t_ns <TAB> topic <TAB> rendered-value) the spec asserts against.

Run from the repo root: python3 scripts/gen_fossil_fixture.py
"""
import base64
import json
import os
import shutil
import struct
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "fossil")

SEGMENT_SIZE = 10000
UNIX_TO_ABS = 62135596800  # seconds from year 1 to the Unix epoch

# --------------------------------------------------------------------- gob


def u(v):
    """gob unsigned int."""
    if v < 128:
        return bytes([v])
    body = v.to_bytes((v.bit_length() + 7) // 8, "big")
    return bytes([256 - len(body)]) + body


def i(v):
    """gob signed int (complement-shift)."""
    return u(v << 1 if v >= 0 else (~v << 1) | 1)


def bs(b):
    """gob byte slice / string payload."""
    return u(len(b)) + b


def s(text):
    return bs(text.encode("utf-8"))


def message(body):
    return u(len(body)) + body


def common_type(name, type_id):
    """CommonType{Name, Id} as an embedded struct (zero Name skipped)."""
    out = b""
    if name:
        out += u(1) + s(name) + u(1) + i(type_id)
    else:
        out += u(2) + i(type_id)
    return out + u(0)


def define_struct(type_id, name, fields):
    """fields: [(fieldName, fieldTypeId)]"""
    body = u(3)  # wireType arm 2: StructT
    body += u(1) + common_type(name, type_id)
    body += u(1) + u(len(fields))
    for fname, fid in fields:
        body += u(1) + s(fname) + u(1) + i(fid) + u(0)
    body += u(0) + u(0)
    return message(i(-type_id) + body)


def define_array(type_id, name, elem_id, length):
    body = u(1)  # wireType arm 0: ArrayT
    body += u(1) + common_type(name, type_id)
    body += u(1) + i(elem_id) + u(1) + i(length) + u(0) + u(0)
    return message(i(-type_id) + body)


def define_slice(type_id, name, elem_id):
    body = u(2)  # wireType arm 1: SliceT
    body += u(1) + common_type(name, type_id)
    body += u(1) + i(elem_id) + u(0) + u(0)
    return message(i(-type_id) + body)


def define_opaque(type_id, name):
    body = u(5)  # wireType arm 4: GobEncoderT
    body += u(1) + common_type(name, type_id) + u(0) + u(0)
    return message(i(-type_id) + body)


def go_time_utc(epoch_ns):
    sec, nsec = divmod(epoch_ns, 1_000_000_000)
    return struct.pack(">BqiH", 1, sec + UNIX_TO_ABS, nsec, 0xFFFF)  # -1 = UTC


def datum_body(delta_ns, topic_id, data):
    """Datum struct body: zero-valued fields omitted."""
    out = b""
    last = -1
    for idx, (val, enc) in enumerate(
        [(delta_ns, i), (topic_id, i), (data, bs)]
    ):
        keep = (len(val) > 0) if isinstance(val, bytes) else (val != 0)
        if keep:
            out += u(idx - last) + enc(val)
            last = idx
    return out + u(0)


def segment_stream(head_ns, datums):
    """Full gob stream for one segment file. datums: [(delta_ns, tid, bytes)]."""
    T_TIME, T_DATUM, T_ARR, T_SEG = 65, 66, 67, 68
    out = define_opaque(T_TIME, "Time")
    out += define_struct(T_DATUM, "Datum", [("Delta", 2), ("TopicID", 2), ("Data", 5)])
    out += define_array(T_ARR, "", T_DATUM, SEGMENT_SIZE)
    out += define_struct(
        T_SEG, "Segment", [("HeadTime", T_TIME), ("Series", T_ARR), ("Size", 2)]
    )
    body = i(T_SEG)
    body += u(1) + bs(go_time_utc(head_ns))  # HeadTime
    body += u(1) + u(SEGMENT_SIZE)  # Series, all slots
    for d in datums:
        body += datum_body(*d)
    body += u(0) * (SEGMENT_SIZE - len(datums))  # zero datums: bare terminators
    if len(datums) > 0:
        body += u(1) + i(len(datums))  # Size (omitted when zero)
    body += u(0)
    return out + message(body)


def v1_stream(name, path, topics, segments):
    """databaseV1 gob stream. segments: [(head_ns, [(delta,tid,data)])]."""
    T_TIME, T_DATUM, T_ARR, T_SEG, T_SEGS, T_STRS, T_DB = 65, 66, 67, 68, 69, 70, 71
    out = define_opaque(T_TIME, "Time")
    out += define_struct(T_DATUM, "Datum", [("Delta", 2), ("TopicID", 2), ("Data", 5)])
    out += define_array(T_ARR, "", T_DATUM, SEGMENT_SIZE)
    out += define_struct(
        T_SEG, "Segment", [("HeadTime", T_TIME), ("Series", T_ARR), ("Size", 2)]
    )
    out += define_slice(T_SEGS, "", T_SEG)
    out += define_slice(T_STRS, "", 6)
    out += define_struct(
        T_DB,
        "databaseV1",
        [
            ("Version", 2),
            ("Name", 6),
            ("Path", 6),
            ("Segments", T_SEGS),
            ("Current", 2),
            ("TopicLookup", T_STRS),
            ("TopicCount", 2),
        ],
    )

    def seg_body(head_ns, datums):
        b = u(1) + bs(go_time_utc(head_ns))
        b += u(1) + u(SEGMENT_SIZE)
        for d in datums:
            b += datum_body(*d)
        b += u(0) * (SEGMENT_SIZE - len(datums))
        if len(datums) > 0:
            b += u(1) + i(len(datums))
        return b + u(0)

    body = i(T_DB)
    body += u(1) + i(1)  # Version
    body += u(1) + s(name)  # Name
    body += u(1) + s(path)  # Path
    body += u(1) + u(len(segments))  # Segments
    for head_ns, datums in segments:
        body += seg_body(head_ns, datums)
    cur = len(segments) - 1
    if cur > 0:
        body += u(1) + i(cur)  # Current (delta 1 from Segments)
        body += u(1) + u(len(topics))  # TopicLookup
    else:
        body += u(2) + u(len(topics))  # skip zero Current
    for t in topics:
        body += s(t)
    if len(topics) > 0:
        body += u(1) + i(len(topics))  # TopicCount
    body += u(0)
    return out + message(body)


def wal_add_event(delta_ns, topic_id, data):
    T_DATUM = 65
    stream = define_struct(
        T_DATUM, "Datum", [("Delta", 2), ("TopicID", 2), ("Data", 5)]
    )
    stream += message(i(T_DATUM) + datum_body(delta_ns, topic_id, data))
    return "1;" + base64.b64encode(stream).decode()


def wal_add_segment(head_ns):
    T_TIME = 65
    stream = define_opaque(T_TIME, "Time")
    stream += message(i(T_TIME) + u(0) + bs(go_time_utc(head_ns)))
    return "2;" + base64.b64encode(stream).decode()


def wal_add_topic(topic, schema):
    stream = message(i(6) + u(0) + s(f"{topic}:{schema}"))
    return "4;" + base64.b64encode(stream).decode()


# ---------------------------------------------------------- fossil payloads


def enc_f64(x):
    return struct.pack("<d", x)


def enc_str(x):
    return x.encode("utf-8")


def enc_composite_note_temp(note, temp):
    """{"note": string, "temp": float64} — sorted keys; string members get
    LE uint32 length prefixes (pkg/query/types/value.go:126-142)."""
    nb = note.encode("utf-8")
    return struct.pack("<I", len(nb)) + nb + struct.pack("<d", temp)


# ------------------------------------------------------------------ fixture


def ns(iso):
    from datetime import datetime, timezone

    return int(
        datetime.fromisoformat(iso).replace(tzinfo=timezone.utc).timestamp()
    ) * 1_000_000_000


def write(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(path, mode) as f:
        f.write(data)


def main():
    shutil.rmtree(OUT, ignore_errors=True)

    # ---------------------------------------------------------------- v2
    topics = ["/", "/sensors/temp", "/sensors/hum", "/logs/app", "/readings"]
    schemas = ["string", "float64", "float64", "string", '{"note": string, "temp": float64}']

    h0, h1 = ns("2024-03-01T00:00:00"), ns("2024-03-01T06:00:00")
    m = 60 * 1_000_000_000  # a minute in ns
    seg0 = [
        (1 * m, 1, enc_f64(20.5)),
        (2 * m, 2, enc_f64(0.41)),
        (3 * m, 3, enc_str("service started")),
        (4 * m, 1, enc_f64(21.25)),
        (5 * m, 4, enc_composite_note_temp("calib", 19.0)),
        (6 * m, 2, enc_f64(0.44)),
        (7 * m, 0, enc_str("root ping")),
        (8 * m, 1, enc_f64(-3.5)),
    ]
    seg1 = [
        (1 * m, 1, enc_f64(22.0)),
        (2 * m, 3, enc_str("rotation: ok")),
        (3 * m, 2, enc_f64(0.39)),
        (4 * m, 4, enc_composite_note_temp("spot<check> & done", 18.25)),
        (5 * m, 1, enc_f64(23.125)),
    ]

    v2 = os.path.join(OUT, "v2")
    write(os.path.join(v2, "segments", "0"), segment_stream(h0, seg0))
    write(os.path.join(v2, "segments", "1"), segment_stream(h1, seg1))
    write(
        os.path.join(v2, "metadata"),
        struct.pack("<III", 2, 2, 1) + b"2024-03-01T06:00:00Z",
    )
    write(os.path.join(v2, "topics"), zlib.compress(json.dumps(topics).encode()))
    write(os.path.join(v2, "schemas"), zlib.compress(json.dumps(schemas).encode()))

    # WAL on top: 2 events continuing seg1, a new topic, a new segment
    # with 2 events, and 3 corrupt lines planted between good ones.
    h2 = ns("2024-03-01T12:00:00")
    wal = [
        wal_add_event(6 * m, 1, enc_f64(24.0)),
        "garbage line with no separator",
        wal_add_event(7 * m, 3, enc_str("pre-segment tail")),
        "1;!!!not-base64!!!",
        wal_add_topic("/alerts", "string"),
        wal_add_segment(h2),
        wal_add_event(1 * m, 5, enc_str("overheat")),
        "7;AAAA",
        wal_add_event(2 * m, 1, enc_f64(25.5)),
    ]
    write(os.path.join(v2, "wal.log"), "\n".join(wal) + "\n")

    def render(tid, data):
        ddl = schemas[tid] if tid < len(schemas) else "string"
        if ddl == "float64":
            return repr(struct.unpack("<d", data)[0])
        if ddl.startswith("{"):
            n = struct.unpack("<I", data[:4])[0]
            note = data[4 : 4 + n].decode()
            temp = struct.unpack("<d", data[4 + n :])[0]
            return f"note={note}|temp={temp!r}"
        return data.decode()

    expected = []
    for head, datums in [(h0, seg0), (h1, seg1)]:
        for delta, tid, data in datums:
            expected.append((head + delta, topics[tid], render(tid, data)))
    wal_topics = topics + ["/alerts"]
    for delta, tid, data in [(6 * m, 1, enc_f64(24.0)), (7 * m, 3, enc_str("pre-segment tail"))]:
        expected.append((h1 + delta, wal_topics[tid], render(tid, data)))
    expected.append((h2 + 1 * m, "/alerts", "overheat"))
    expected.append((h2 + 2 * m, "/sensors/temp", render(1, enc_f64(25.5))))
    expected.sort()
    write(
        os.path.join(v2, "expected.tsv"),
        "".join(f"{t}\t{topic}\t{val}\n" for t, topic, val in expected),
    )

    # ---------------------------------------------------------------- v1
    v1_topics = ["/", "/legacy/a", "/legacy/b"]
    g0 = ns("2023-06-15T08:00:00")
    v1_seg = [
        (1 * m, 1, enc_str("alpha")),
        (2 * m, 2, enc_str("beta")),
        (3 * m, 1, enc_str("gamma")),
        (4 * m, 0, enc_str("root note")),
    ]
    v1dir = os.path.join(OUT, "v1")
    write(
        os.path.join(v1dir, "database"),
        v1_stream("legacy", "/data/legacy", v1_topics, [(g0, v1_seg)]),
    )
    write(
        os.path.join(v1dir, "wal.log"),
        wal_add_event(5 * m, 2, enc_str("from-wal")) + "\n",
    )
    v1_expected = [
        (g0 + d, v1_topics[t], data.decode()) for d, t, data in v1_seg
    ] + [(g0 + 5 * m, "/legacy/b", "from-wal")]
    v1_expected.sort()
    write(
        os.path.join(v1dir, "expected.tsv"),
        "".join(f"{t}\t{topic}\t{val}\n" for t, topic, val in v1_expected),
    )

    # ------------------------------------------------------------ WAL-only
    # a never-serialized database: NewDatabase writes AddSegment+AddTopic
    # first (pkg/database/db.go:697-709)
    w0 = ns("2024-05-05T00:00:00")
    wdir = os.path.join(OUT, "walonly")
    wal2 = [
        wal_add_segment(w0),
        wal_add_topic("/", "string"),
        wal_add_topic("/fresh", "float64"),
        wal_add_event(1 * m, 1, enc_f64(7.5)),
        wal_add_event(2 * m, 1, enc_f64(8.25)),
    ]
    write(os.path.join(wdir, "wal.log"), "\n".join(wal2) + "\n")
    w_expected = sorted(
        [
            (w0 + 1 * m, "/fresh", repr(7.5)),
            (w0 + 2 * m, "/fresh", repr(8.25)),
        ]
    )
    write(
        os.path.join(wdir, "expected.tsv"),
        "".join(f"{t}\t{topic}\t{val}\n" for t, topic, val in w_expected),
    )

    n_files = sum(len(fs) for _, _, fs in os.walk(OUT))
    print(f"wrote {n_files} fixture files under {OUT}")


if __name__ == "__main__":
    main()
