"""GPMF parser tests: KLV decode, MP4 box walking, stream assembly with the
reference's axis remaps — on a synthetic GoPro-style MP4 built in the test."""

import struct

import numpy as np
import pytest

from pi3_slam_tpu.utils.gpmf import (
    extract_streams,
    gopro_telemetry_from_mp4,
    parse_gpmf_mp4,
    parse_klv,
)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def klv(key: bytes, typ: bytes, ssize: int, repeat: int, payload: bytes) -> bytes:
    pad = (4 - len(payload) % 4) % 4
    return key + typ + bytes([ssize]) + struct.pack(">H", repeat) + payload + b"\x00" * pad


def klv_container(key: bytes, inner: bytes) -> bytes:
    assert len(inner) % 4 == 0
    return key + b"\x00\x01" + struct.pack(">H", len(inner)) + inner


def gpmf_payload(accl: np.ndarray, gyro: np.ndarray, scal: int = 1) -> bytes:
    """One DEVC payload with an ACCL stream and a GYRO stream."""
    def sensor(key, arr):
        data = (np.asarray(arr, np.float64) * scal).astype(">i2").tobytes()
        inner = klv(b"SCAL", b"s", 2, 1, struct.pack(">h", scal))
        inner += klv(key, b"s", 6, len(arr), data)
        return klv_container(b"STRM", inner)

    return klv_container(b"DEVC", sensor(b"ACCL", accl) + sensor(b"GYRO", gyro))


def box(kind: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + kind + payload


def full_box(kind: bytes, payload: bytes, version=0, flags=0) -> bytes:
    return box(kind, struct.pack(">I", (version << 24) | flags) + payload)


def build_mp4(payloads, payload_dur_ts=1001, timescale=1000, video_fps=30.0) -> bytes:
    """Minimal MP4: mdat with GPMF payloads + moov with a gpmd meta trak and
    a stub video trak (for fps detection)."""
    mdat_payload = b"".join(payloads)
    mdat = box(b"mdat", mdat_payload)
    mdat_data_start = 8  # mdat payload offset within file (mdat is first)

    sizes = [len(p) for p in payloads]
    offsets = np.cumsum([mdat_data_start] + sizes)[:-1]

    def meta_trak():
        stsd = full_box(b"stsd", struct.pack(">I", 1) + box(b"gpmd", b"\x00" * 8))
        stsz = full_box(b"stsz", struct.pack(">II", 0, len(sizes)) +
                        b"".join(struct.pack(">I", s) for s in sizes))
        stco = full_box(b"stco", struct.pack(">I", len(offsets)) +
                        b"".join(struct.pack(">I", int(o)) for o in offsets))
        stsc = full_box(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, 1, 1))
        stts = full_box(b"stts", struct.pack(">I", 1) +
                        struct.pack(">II", len(sizes), payload_dur_ts))
        stbl = box(b"stbl", stsd + stsz + stco + stsc + stts)
        minf = box(b"minf", stbl)
        hdlr = full_box(b"hdlr", b"\x00" * 4 + b"meta" + b"\x00" * 12)
        mdhd = full_box(b"mdhd", struct.pack(">IIII", 0, 0, timescale, 0) + b"\x00" * 4)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        return box(b"trak", mdia)

    def video_trak():
        dur = int(round(timescale / video_fps))
        stts = full_box(b"stts", struct.pack(">I", 1) + struct.pack(">II", 90, dur))
        stsd = full_box(b"stsd", struct.pack(">I", 1) + box(b"avc1", b"\x00" * 8))
        stsz = full_box(b"stsz", struct.pack(">II", 100, 90))
        stco = full_box(b"stco", struct.pack(">I", 0))
        stbl = box(b"stbl", stsd + stsz + stco + stts)
        minf = box(b"minf", stbl)
        hdlr = full_box(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12)
        mdhd = full_box(b"mdhd", struct.pack(">IIII", 0, 0, timescale, 0) + b"\x00" * 4)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        return box(b"trak", mdia)

    moov = box(b"moov", meta_trak() + video_trak())
    ftyp = box(b"ftyp", b"mp42" + b"\x00" * 4)
    # mdat first so the precomputed offsets hold, ftyp appended after moov is
    # non-standard but legal for the parser (box order is free in ISO BMFF)
    return mdat + moov + ftyp


# ---------------------------------------------------------------------------
# KLV-level tests
# ---------------------------------------------------------------------------


def test_parse_klv_scalars_and_nesting():
    accl = np.array([[1, 2, 3], [4, 5, 6]], np.int16)
    payload = gpmf_payload(accl, accl * 2, scal=1)
    items = parse_klv(payload)
    assert items[0][0] == b"DEVC"
    streams = extract_streams(items)
    np.testing.assert_allclose(np.concatenate(streams[b"ACCL"]["data"]), accl)
    np.testing.assert_allclose(np.concatenate(streams[b"GYRO"]["data"]), accl * 2)


def test_parse_klv_scal_division():
    # raw int16 samples with an explicit SCAL divisor (no pre-multiplication)
    data = np.array([[100, 200, 300]], ">i2").tobytes()
    inner = klv(b"SCAL", b"s", 2, 1, struct.pack(">h", 100))
    inner += klv(b"ACCL", b"s", 6, 1, data)
    payload = klv_container(b"DEVC", klv_container(b"STRM", inner))
    streams = extract_streams(parse_klv(payload))
    np.testing.assert_allclose(
        np.concatenate(streams[b"ACCL"]["data"]), [[1.0, 2.0, 3.0]]
    )


def test_parse_klv_alignment():
    # 2-byte payload needs 2 bytes padding; following item must still parse
    b1 = klv(b"GPSF", b"l", 4, 1, struct.pack(">i", 3))
    b2 = klv(b"XXXX", b"s", 2, 1, struct.pack(">h", 7))
    items = parse_klv(b1 + b2)
    assert [k for k, _ in items] == [b"GPSF", b"XXXX"]


# ---------------------------------------------------------------------------
# MP4-level tests
# ---------------------------------------------------------------------------


@pytest.fixture()
def mp4_path(tmp_path):
    rng = np.random.default_rng(0)
    payloads = []
    for i in range(3):
        accl = rng.integers(-1000, 1000, (10, 3)).astype(np.int16)
        gyro = rng.integers(-1000, 1000, (10, 3)).astype(np.int16)
        payloads.append(gpmf_payload(accl, gyro, scal=100))
    path = tmp_path / "clip.mp4"
    path.write_bytes(build_mp4(payloads))
    return str(path)


def test_parse_gpmf_mp4_structure(mp4_path):
    parsed = parse_gpmf_mp4(mp4_path)
    assert len(parsed["payloads"]) == 3
    np.testing.assert_allclose(parsed["payload_times_s"], [0.0, 1.001, 2.002])
    assert abs(parsed["camera_fps"] - 30.3) < 0.5  # timescale 1000 / dur 33


def test_gopro_telemetry_from_mp4_remaps_and_times(mp4_path):
    g = gopro_telemetry_from_mp4(mp4_path)
    assert g["accl"].shape == (30, 3)
    assert g["gyro"].shape == (30, 3)
    # 10 samples uniformly over each 1.001 s payload
    np.testing.assert_allclose(g["accl_t"][:3], [0.0, 0.1001, 0.2002], atol=1e-9)
    assert g["accl_t"][-1] < 3.01

    # axis remap check: re-parse raw and compare orders
    parsed = parse_gpmf_mp4(mp4_path)
    raw = np.concatenate(
        [np.concatenate(extract_streams(p)[b"ACCL"]["data"]) for p in parsed["payloads"]]
    )
    np.testing.assert_allclose(g["accl"], raw[:, [1, 2, 0]])


def test_telemetry_importer_reads_mp4(mp4_path):
    from pi3_slam_tpu.utils.telemetry import TelemetryImporter

    imp = TelemetryImporter()
    t = imp.read_gopro_mp4(mp4_path)
    assert t.accl.shape == (30, 3)
    assert t.gyro.shape == (30, 3)
    assert t.camera_fps > 25.0
    # export path still works on the parsed data
    from pi3_slam_tpu.utils.telemetry import TelemetryConverter

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        TelemetryConverter(imp).to_kalibr_csv(os.path.join(d, "imu.csv"))
        assert os.path.getsize(os.path.join(d, "imu.csv")) > 0


def test_missing_gpmf_track_raises(tmp_path):
    p = tmp_path / "plain.mp4"
    p.write_bytes(box(b"ftyp", b"mp42") + box(b"moov", b""))
    with pytest.raises(IOError, match="gpmd|GPMF"):
        parse_gpmf_mp4(str(p))
