"""MoE silicon-benchmark tool: the measurement paths run hermetically
(interpret-mode kernels, tiny shapes) with their on-device oracles."""


def test_moe_bench_prefill_paths_gate_and_run(capsys):
    from how_to_optimize_gemm_tpu.parallel import moe_bench
    moe_bench.bench_prefill(t=128, d=128, f=128, e=4, k=2, kind="bf16")
    out = capsys.readouterr().out
    assert "ragged (grouped GEMM)" in out
    assert "dispatch (dropless cf=E/k)" in out
    assert "ms/call" in out


def test_moe_bench_train_step_runs(capsys):
    from how_to_optimize_gemm_tpu.parallel import moe_bench
    moe_bench.bench_train(t=128, d=128, f=128, e=4, k=2, kind="int8")
    out = capsys.readouterr().out
    assert "trainable leaves" in out
