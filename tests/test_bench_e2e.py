"""The measured-e2e bench's TRUE closed loop (VERDICT r4 item 6), smoked on
CPU at tiny shapes: producer thread -> device_put of every produced batch ->
train step, through the real bench_e2e_overlapped code path.

On the TPU dev tunnel the h2d probe (<1 GB/s) auto-selects the staged loop,
so the true loop never runs there — this test pins it on the CPU device
(where device_put is ~free), including the int8-store producer + on-device
dequant consumer combination the production pipeline ships.
"""

import importlib
import os

import pytest


@pytest.mark.slow
def test_true_loop_runs_and_reports_mode(tmp_path, monkeypatch):
    monkeypatch.setenv("SDUMC_BENCH_FEAT_ROOT", str(tmp_path / "feats"))
    import bench

    importlib.reload(bench)
    # shrink the corpus: 1 batch of 8 tiny clips, 1 timed epoch
    monkeypatch.setattr(bench, "BATCH_SIZE", 8)
    monkeypatch.setattr(bench, "N_BATCHES", 1)
    monkeypatch.setattr(bench, "N_CLIPS", 8)
    monkeypatch.setattr(bench, "TIMED_EPOCHS", 1)
    monkeypatch.setattr(bench, "DIMS", (16, 32, 16, 32))
    monkeypatch.setattr(bench, "BUCKETS", (8, 16))
    monkeypatch.setattr(bench, "REGIMES", {
        "audio": (16, 4, 12), "text": (32, 2, 6),
        "video": (16, 2, 8), "feat4": (32, 2, 6)})

    cps, mode = bench.bench_e2e_overlapped(store_dtype="int8", mode="true")
    assert cps > 0
    assert mode.startswith("true")
    # the int8 store really fed the loop: codes + scales exist on disk
    root = os.environ["SDUMC_BENCH_FEAT_ROOT"]
    assert os.path.exists(os.path.join(root, "audio_int8.scales.bin"))
