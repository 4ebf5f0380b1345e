"""AOT serving export (io/export.py + cli/export.py): the serialized
artifact must reproduce the live eval step bit-for-bit and load without
the framework's model stack."""
import os

import jax
import numpy as np
import pytest

from diff3dhpe_tpu.config import Config
from diff3dhpe_tpu.engine.runner import Runner
from diff3dhpe_tpu.io.export import export_eval_step, restore_eval_step

H36M_JL = [4, 5, 6, 11, 12, 13]
H36M_JR = [1, 2, 3, 14, 15, 16]


@pytest.fixture(scope="module")
def tiny_runner():
    cfg = Config(
        stride=9, number_of_frames=9, embed_dim=32, transformer_depth=1,
        timesteps=20, sampling_timesteps=3, batch_size=4, batch_size_eval=4,
    )
    runner = Runner(cfg, 17, H36M_JL, H36M_JR)
    runner.set_params(runner.init_params())
    return runner


def test_export_roundtrip_matches_live_step(tiny_runner, tmp_path):
    runner = tiny_runner
    path = str(tmp_path / "eval.jaxexport")
    data = export_eval_step(runner, batch_size=2, path=path)
    assert isinstance(data, bytes) and len(data) > 0
    assert os.path.getsize(path) == len(data)

    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 17, 2)).astype(np.float32)
    xf = rng.standard_normal((2, 9, 17, 2)).astype(np.float32)

    live = np.asarray(runner.eval_step(runner.state.params, key, x, xf))

    # Restore from bytes and from the file path. The artifact recompiles
    # from serialized StableHLO, so fusion order may differ from the live
    # jit in the last ulp — same program, not bit-pinned.
    for artifact in (data, path):
        step = restore_eval_step(artifact)
        served = np.asarray(step(runner.state.params, key, x, xf))
        assert served.shape == (2, 9, 17, 3)
        np.testing.assert_allclose(served, live, rtol=3e-6, atol=3e-6)


def test_export_artifact_is_weight_agnostic(tiny_runner, tmp_path):
    """Weights are runtime inputs: one artifact serves any checkpoint of
    the same architecture."""
    runner = tiny_runner
    step = restore_eval_step(export_eval_step(runner, batch_size=1))
    key = jax.random.PRNGKey(0)
    x = np.zeros((1, 9, 17, 2), np.float32)

    p1 = runner.state.params
    p2 = runner.init_params(seed=123)
    out1 = np.asarray(step(p1, key, x, x))
    out2 = np.asarray(step(p2, key, x, x))
    assert out1.shape == out2.shape == (1, 9, 17, 3)
    assert not np.array_equal(out1, out2)


def test_export_sharded_multichip_artifact():
    """sharded=True bakes the 8-device shard_map data-parallel program into
    the artifact; the restored call reproduces the live mesh-bound step."""
    cfg = Config(
        stride=9, number_of_frames=9, embed_dim=32, transformer_depth=1,
        timesteps=20, sampling_timesteps=3, mesh_shape="data:8", fast_eval=True,
    )
    runner = Runner(cfg, 17, H36M_JL, H36M_JR)
    runner.set_params(runner.init_params())

    with pytest.raises(ValueError):
        export_eval_step(runner, batch_size=3, sharded=True)

    data = export_eval_step(runner, batch_size=8, sharded=True)
    step = restore_eval_step(data)
    key = jax.random.PRNGKey(5)
    x = np.random.default_rng(1).standard_normal((8, 9, 17, 2)).astype(np.float32)
    live = np.asarray(runner.eval_step(runner.state.params, key, x, x))
    served = np.asarray(step(runner.state.params, key, x, x))
    assert served.shape == (8, 9, 17, 3)
    np.testing.assert_allclose(served, live, rtol=3e-6, atol=3e-6)


def test_export_fused_tpu_artifact_from_cpu_host():
    """The production config (fused Pallas fast-eval) cross-lowers to a
    TPU-platform artifact from a CPU host: Mosaic kernels serialize as
    stablehlo custom calls, compiled on the serving TPU at load time."""
    cfg = Config(
        stride=9, number_of_frames=9, embed_dim=32, transformer_depth=1,
        timesteps=20, sampling_timesteps=3, fast_eval=True,
    )
    runner = Runner(cfg, 17, H36M_JL, H36M_JR)
    runner.set_params(runner.init_params())
    data = export_eval_step(runner, batch_size=1, platforms=["tpu"])
    assert len(data) > 0


def test_export_cli_end_to_end(tmp_path):
    """Train one tiny synthetic epoch, then export its best checkpoint via
    the CLI and replay the artifact."""
    from diff3dhpe_tpu.cli.export import main as export_main
    from diff3dhpe_tpu.cli.run import main as run_main

    args_common = [
        "--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
        "-c", str(tmp_path), "-a", "Walking", "-str", "S1", "-ste", "S9",
        "--synthetic", "-frame", "9", "-s", "9",
        "--embed_dim", "32", "--transformer_depth", "1",
        "--timesteps", "20", "--sampling_timesteps", "3",
        "-e", "1", "-b", "8", "--batch-size-eval", "16",
    ]
    run_main(args_common)

    out = str(tmp_path / "eval.jaxexport")
    export_main(args_common + [
        "--evaluate", "best_epoch", "--output", out, "--export-batch-size", "2",
    ])
    assert os.path.getsize(out) > 0

    step = restore_eval_step(out)
    key = jax.random.PRNGKey(1)
    x = np.zeros((2, 9, 17, 2), np.float32)
    served = np.asarray(step_params_call(step, tmp_path, key, x))
    assert served.shape == (2, 9, 17, 3)
    assert np.all(np.isfinite(served))


def step_params_call(step, ckpt_dir, key, x):
    """Replay the artifact with the trained checkpoint's weights."""
    from diff3dhpe_tpu.io.checkpoint import restore_checkpoint

    cfg = Config(
        stride=9, number_of_frames=9, embed_dim=32, transformer_depth=1,
        timesteps=20, sampling_timesteps=3,
    )
    runner = Runner(cfg, 17, H36M_JL, H36M_JR)
    runner.set_params(runner.init_params())
    state, _ = restore_checkpoint(os.path.join(str(ckpt_dir), "best_epoch"), runner.state)
    return step(state.params, key, x, x)
