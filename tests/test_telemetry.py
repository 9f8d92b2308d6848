"""Telemetry importer/exporter tests."""

import json

import numpy as np

from pi3_slam_tpu.utils.telemetry import TelemetryImporter, TelemetryConverter


def test_generic_json_flat_roundtrip(tmp_path, rng):
    t = np.arange(0, 1.0, 0.01)
    acc = np.concatenate([t[:, None], rng.normal(size=(100, 3))], axis=1)
    gyr = np.concatenate([t[:, None], rng.normal(size=(100, 3))], axis=1)
    grav = np.concatenate([t[:, None], np.tile([0, 0, -9.81], (100, 1))], axis=1)
    src = tmp_path / "telemetry.json"
    src.write_text(json.dumps({
        "accelerometer": acc.tolist(),
        "gyroscope": gyr.tolist(),
        "gravity": grav.tolist(),
        "camera_fps": 30.0,
    }))

    imp = TelemetryImporter()
    data = imp.read_generic_json(str(src))
    np.testing.assert_allclose(data.accl, acc[:, 1:])
    assert data.camera_fps == 30.0

    g = imp.gravity_at_times(np.array([0.105, 0.5]))
    np.testing.assert_allclose(g, [[0, 0, -1], [0, 0, -1]], atol=1e-6)

    out = tmp_path / "out.json"
    TelemetryConverter(imp).to_json(str(out))
    back = TelemetryImporter().read_generic_json(str(out))
    np.testing.assert_allclose(back.gyro, gyr[:, 1:])


def test_gopro_streams_json(tmp_path):
    samples = [{"value": [1.0, 2.0, 3.0], "cts": 100.0}, {"value": [4.0, 5.0, 6.0], "cts": 200.0}]
    src = tmp_path / "gp.json"
    src.write_text(json.dumps({"1": {"streams": {"ACCL": {"samples": samples},
                                                 "GYRO": {"samples": samples}}}}))
    data = TelemetryImporter().read_generic_json(str(src))
    np.testing.assert_allclose(data.accl_t, [0.1, 0.2])
    # reference axis remap: stream z,x,y -> camera x,y,z via [1,2,0]
    # (telemetry_converter.py:111-115)
    np.testing.assert_allclose(data.accl[1], [5, 6, 4])


def test_csv_and_kalibr_export(tmp_path, rng):
    rows = ["#header", "0.0,0.1,0.2,0.3,1.0,2.0,3.0", "0.01,0.2,0.3,0.4,1.1,2.1,3.1"]
    src = tmp_path / "imu.csv"
    src.write_text("\n".join(rows))
    imp = TelemetryImporter()
    data = imp.read_csv(str(src))
    assert data.accl.shape == (2, 3)
    np.testing.assert_allclose(data.gyro[0], [0.1, 0.2, 0.3])

    out = tmp_path / "kalibr.csv"
    TelemetryConverter(imp).to_kalibr_csv(str(out))
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("#timestamp")
    assert len(lines) == 3
    assert lines[1].split(",")[0] == "0"


def test_zed_jsonl(tmp_path):
    lines = [
        json.dumps({"timestamp": 1_000_000_000, "linear_acceleration": [0, 0, 9.8],
                    "angular_velocity": [0.1, 0, 0]}),
        json.dumps({"timestamp": 1_100_000_000, "linear_acceleration": [0, 0, 9.7],
                    "angular_velocity": [0.2, 0, 0]}),
    ]
    src = tmp_path / "zed.jsonl"
    src.write_text("\n".join(lines))
    data = TelemetryImporter().read_zed_jsonl(str(src))
    np.testing.assert_allclose(data.accl_t, [1.0, 1.1])
    np.testing.assert_allclose(data.gyro[:, 0], [0.1, 0.2])
