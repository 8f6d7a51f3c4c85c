"""Interleaved A/B protocol: bookkeeping, artifact accumulation."""
import json

from how_to_optimize_gemm_tpu.harness import ab


def test_ab_protocol_counts_and_artifact(tmp_path):
    res = ab.run_protocol("02_pallas_mn_tile", "01_xla_fp32", [128],
                          rounds=3, artifact_dir=tmp_path,
                          verbose=False)
    assert len(res) == 1
    r = res[0]
    assert r.wins_a + r.wins_b + r.ties == r.rounds == 3
    assert len(r.a_gflops) == len(r.b_gflops) == 3
    assert r.a_median > 0 and r.b_median > 0
    path = tmp_path / "ab_02_pallas_mn_tile_vs_01_xla_fp32.json"
    data = json.loads(path.read_text())
    assert data["a"] == "02_pallas_mn_tile"
    assert len(data["sessions"]) == 1
    # second session appends (the multi-day record)
    ab.run_protocol("02_pallas_mn_tile", "01_xla_fp32", [128],
                    rounds=3, artifact_dir=tmp_path, verbose=False)
    data = json.loads(path.read_text())
    assert len(data["sessions"]) == 2
    sz = data["sessions"][1]["sizes"][0]
    assert sz["p"] == 128 and len(sz["a_gflops"]) == 3


def test_ab_median():
    assert ab._median([3.0, 1.0, 2.0]) == 2.0
    assert ab._median([4.0, 1.0, 2.0, 3.0]) == 2.5
