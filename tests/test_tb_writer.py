"""TensorBoard event-file writer roundtrip + format pins (SURVEY.md C17).

The reference's Colab workflow tails Detectron2's event stream with
%tensorboard (COLAB_PORT.py); our writer must emit bit-valid TFRecord/Event
framing so a stock TensorBoard can read it.  CRC32C and the proto layout
are pinned against known-good values.
"""

import struct

from uwcv_tpu.utils.tb_writer import (
    SummaryWriter,
    _masked_crc,
    crc32c,
    read_scalars,
)


def test_crc32c_known_vectors():
    # RFC 3720 / iSCSI test vectors for the Castagnoli polynomial
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_roundtrip_scalars(tmp_path):
    with SummaryWriter(str(tmp_path)) as w:
        w.add_scalars(1, {"train/loss": 2.5, "train/lr": 0.02})
        w.add_scalar("train/loss", 1.25, step=2)
    events = read_scalars(w.path)
    assert events[0][0] == 1
    assert abs(events[0][1]["train/loss"] - 2.5) < 1e-6
    assert abs(events[0][1]["train/lr"] - 0.02) < 1e-6
    assert events[1] == (2, {"train/loss": 1.25})


def test_file_version_header(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.close()
    raw = open(w.path, "rb").read()
    (length,) = struct.unpack("<Q", raw[:8])
    payload = raw[12:12 + length]
    # framing CRCs valid + the TensorBoard magic version string present
    assert struct.unpack("<I", raw[8:12])[0] == _masked_crc(raw[:8])
    assert b"brain.Event:2" in payload
    assert "events.out.tfevents." in w.path
