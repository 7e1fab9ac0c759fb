"""MetricsWriter: JSONL + hand-encoded TensorBoard event files.

Structural checks are dependency-free (re-parse the TFRecord framing and
CRCs); when the ``tensorboard`` package is importable the file is also
read back through TensorBoard's own EventAccumulator — the authoritative
conformance check for the hand-encoded protos.
"""

import json
import os
import struct

import pytest

from nhans_tpu.train.metrics import MetricsWriter
from nhans_tpu.utils.tb_events import _masked_crc


def _records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if not hdr:
                return out
            (n,) = struct.unpack("<Q", hdr)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(hdr), "length CRC mismatch"
            data = f.read(n)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "data CRC mismatch"
            out.append(data)


def test_jsonl_and_event_file_written(tmp_path):
    w = MetricsWriter(str(tmp_path), "nhans")
    w.write(10, {"loss": 1.5, "si_sdr": 3.25})
    w.write(20, {"loss": 1.0})
    w.close()

    rows = [json.loads(line) for line in open(tmp_path / "nhans.jsonl")]
    assert rows[0]["loss"] == 1.5

    evs = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    assert len(evs) == 1
    recs = _records(os.path.join(tmp_path, evs[0]))
    # file_version record + 2 scalar records, CRCs all verified
    assert len(recs) == 3
    assert b"brain.Event:2" in recs[0]
    assert b"loss" in recs[1] and b"si_sdr" in recs[1]


def test_tensorboard_reads_back(tmp_path):
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")

    w = MetricsWriter(str(tmp_path), "nhans")
    for step, loss in ((1, 2.0), (2, 1.5), (3, 1.25)):
        w.write(step, {"loss": loss, "eval/si_sdr_gain": step * 0.5})
    w.close()

    acc = ea_mod.EventAccumulator(str(tmp_path))
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert "loss" in tags and "eval/si_sdr_gain" in tags
    loss = acc.Scalars("loss")
    assert [e.step for e in loss] == [1, 2, 3]
    assert [round(e.value, 4) for e in loss] == [2.0, 1.5, 1.25]


def test_non_numeric_values_skipped(tmp_path):
    w = MetricsWriter(str(tmp_path), "nhans")
    w._tb.add_scalars(1, {"ok": 1.0, "bad": "string"})
    w.close()
    evs = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    recs = _records(os.path.join(tmp_path, evs[0]))
    assert len(recs) == 2  # version + one scalar record, no crash
