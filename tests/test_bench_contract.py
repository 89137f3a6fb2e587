"""bench.py's driver contract: stdout carries exactly ONE JSON line.

The golden-lego harness prints its own report JSON to stdout when run
standalone; embedded in bench --full it must be silenced (r3 review
finding) — otherwise the driver records the wrong line."""

import io
import json
from contextlib import redirect_stdout


def test_golden_row_keeps_stdout_clean(monkeypatch, tmp_path):
    import bench
    import scripts.golden_lego as gl

    monkeypatch.setattr(gl, "find_inputs",
                        lambda: (str(tmp_path), str(tmp_path / "w.npy")))

    def noisy_main(argv):
        # The real harness prints progress AND its report JSON to stdout.
        print("view 000: ours 30.1 dB vs torch 30.1 dB")
        print(json.dumps({"status": "ok", "max_delta_db": 0.03}))
        return {"status": "ok", "max_delta_db": 0.03, "n_views": 3}

    monkeypatch.setattr(gl, "main", noisy_main)

    buf = io.StringIO()
    with redirect_stdout(buf):
        row = bench._golden_lego_row()
    assert buf.getvalue() == "", "harness output leaked onto bench stdout"
    assert row["metric"] == "golden_lego_max_delta_db"
    assert row["value"] == 0.03


def test_skip_row_when_assets_missing(monkeypatch):
    import bench
    import scripts.golden_lego as gl

    monkeypatch.setattr(gl, "find_inputs", lambda: (None, None))
    buf = io.StringIO()
    with redirect_stdout(buf):
        row = bench._golden_lego_row()
    assert buf.getvalue() == ""
    assert row["value"] == -1.0
    assert "not mounted" in row["unit"]


def test_full_head_is_one_json_line():
    import bench

    rows = [bench._row("train_bf16_pallas", 114532.7, "rays/s", 16.1)]
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit_full_head(rows)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1
    head = json.loads(lines[0])
    assert head["metric"] == "train_rays_per_sec_per_chip"
    assert head["vs_baseline"] == 16.1
