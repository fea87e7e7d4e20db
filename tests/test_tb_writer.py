"""TensorBoard event-writer: TFRecord framing + proto wire format.

Validates the hand-encoded event files against tensorflow's own Event
proto parser when available (authoritative cross-check), plus a
dependency-free framing check (lengths + masked CRC32C).
"""
import struct

import numpy as np
import pytest

from scflow_tpu.utils.tb_writer import TBEventWriter, _masked_crc, crc32c


def read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return out
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header CRC mismatch"
            assert dcrc == _masked_crc(data), "data CRC mismatch"
            out.append(data)


class TestCRC32C:
    def test_known_vectors(self):
        # RFC 3720 §B.4 test vectors
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43
        assert crc32c(bytes(range(32))) == 0x46DD794E
        assert crc32c(b"123456789") == 0xE3069283


class TestTBEventWriter:
    def test_framing_and_roundtrip(self, tmp_path):
        w = TBEventWriter(str(tmp_path))
        w.add_scalar("loss", 1.5, step=10)
        w.add_scalars({"a": 2.0, "b": -3.25}, step=11)
        w.add_image("panel", np.zeros((8, 12, 3), np.uint8), step=12)
        w.close()

        records = read_records(w.path)
        assert len(records) == 4  # version + scalar + scalars + image

        tf_event = pytest.importorskip(
            "tensorflow.core.util.event_pb2", reason="tf protos unavailable")
        ev = tf_event.Event.FromString(records[0])
        assert ev.file_version == "brain.Event:2"

        ev = tf_event.Event.FromString(records[1])
        assert ev.step == 10
        assert ev.summary.value[0].tag == "loss"
        assert ev.summary.value[0].simple_value == 1.5

        ev = tf_event.Event.FromString(records[2])
        assert ev.step == 11
        got = {v.tag: v.simple_value for v in ev.summary.value}
        assert got == {"a": 2.0, "b": -3.25}

        ev = tf_event.Event.FromString(records[3])
        v = ev.summary.value[0]
        assert v.tag == "panel"
        assert v.image.height == 8 and v.image.width == 12
        assert v.image.encoded_image_string[:8] == b"\x89PNG\r\n\x1a\n"

    def test_trainer_wiring(self, tmp_path):
        """Trainer._log mirrors scalar records into work_dir/tb."""
        import glob
        import os

        from scflow_tpu.training.config import Config

        cfg = Config(work_dir=str(tmp_path))
        from scflow_tpu.training.trainer import Trainer

        class Stub:  # only what _log touches
            _log_file = None
            _tb_writer = None
            tb_writer = Trainer.tb_writer

        stub = Stub()
        stub.cfg = cfg
        Trainer._log(stub, {"step": 5, "loss": 0.25})
        files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.*"))
        assert len(files) == 1
        records = read_records(files[0])
        assert len(records) == 2  # version + scalars
