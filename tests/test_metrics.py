"""TensorBoard event-file writer (SURVEY.md §5 metrics row).

The writer hand-rolls the TFRecord + Event-proto encoding; this test decodes
the file with an independent minimal parser — frame lengths, both CRC32C
checks, and the proto fields — so a corrupted encoding cannot pass.
"""

import struct

import numpy as np

from indirect_learning_pose_shape_tpu.utils.metrics import (
    MetricsWriter,
    TensorBoardWriter,
    _crc32c,
    _masked_crc,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli).
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def _read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _parse_records(path):
    data = open(path, "rb").read()
    records = []
    i = 0
    while i < len(data):
        (length,) = struct.unpack_from("<Q", data, i)
        (len_crc,) = struct.unpack_from("<I", data, i + 8)
        assert len_crc == _masked_crc(data[i : i + 8]), "length CRC mismatch"
        payload = data[i + 12 : i + 12 + length]
        (payload_crc,) = struct.unpack_from("<I", data, i + 12 + length)
        assert payload_crc == _masked_crc(payload), "payload CRC mismatch"
        records.append(payload)
        i += 12 + length + 4
    return records


def _parse_event(payload):
    ev = {"scalars": {}}
    i = 0
    while i < len(payload):
        tag, i = _read_varint(payload, i)
        num, wire = tag >> 3, tag & 7
        if wire == 1:  # double
            (val,) = struct.unpack_from("<d", payload, i)
            i += 8
            if num == 1:
                ev["wall_time"] = val
        elif wire == 0:
            val, i = _read_varint(payload, i)
            if num == 2:
                ev["step"] = val
        elif wire == 2:
            length, i = _read_varint(payload, i)
            sub = payload[i : i + length]
            i += length
            if num == 3:
                ev["file_version"] = sub.decode()
            elif num == 5:  # summary: repeated value submessages
                j = 0
                while j < len(sub):
                    vt, j = _read_varint(sub, j)
                    assert vt >> 3 == 1 and vt & 7 == 2
                    vlen, j = _read_varint(sub, j)
                    val_msg = sub[j : j + vlen]
                    j += vlen
                    k = 0
                    tag_name, simple = None, None
                    while k < len(val_msg):
                        ft, k = _read_varint(val_msg, k)
                        if ft >> 3 == 1 and ft & 7 == 2:
                            flen, k = _read_varint(val_msg, k)
                            tag_name = val_msg[k : k + flen].decode()
                            k += flen
                        elif ft >> 3 == 2 and ft & 7 == 5:
                            (simple,) = struct.unpack_from("<f", val_msg, k)
                            k += 4
                        else:
                            raise AssertionError(f"unexpected field {ft}")
                    ev["scalars"][tag_name] = simple
        else:
            raise AssertionError(f"unexpected wire type {wire}")
    return ev


def test_event_file_roundtrip(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.write(1, {"loss/total": 0.5, "lr": 1e-4})
    w.write(2, {"loss/total": 0.25})
    w.close()

    records = _parse_records(w.path)
    assert len(records) == 3
    head = _parse_event(records[0])
    assert head["file_version"] == "brain.Event:2"
    e1 = _parse_event(records[1])
    assert e1["step"] == 1
    np.testing.assert_allclose(e1["scalars"]["loss/total"], 0.5)
    np.testing.assert_allclose(e1["scalars"]["lr"], 1e-4, rtol=1e-6)
    assert e1["wall_time"] > 1e9
    e2 = _parse_event(records[2])
    assert e2["step"] == 2 and "lr" not in e2["scalars"]


def test_metrics_writer_tees_jsonl_and_tb(tmp_path):
    jsonl = tmp_path / "m.jsonl"
    mw = MetricsWriter(str(jsonl), tensorboard_dir=str(tmp_path / "tb"))
    mw.write(0, {"loss": 1.0})
    mw.write(1, {"loss": 0.5})
    mw.close()
    import json

    lines = [json.loads(line) for line in open(jsonl)]
    assert [r["step"] for r in lines] == [0, 1]
    tb_files = list((tmp_path / "tb").iterdir())
    assert len(tb_files) == 1
    events = [_parse_event(r) for r in _parse_records(str(tb_files[0]))]
    assert events[-1]["scalars"]["loss"] == 0.5
