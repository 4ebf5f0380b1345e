"""Diffusion engine tests: q_sample, p_losses, and the lax.scan DDIM loop
checked against a step-by-step Python replication of the reference update
rule (reference: diff_s2s.py ddim_sample_loop:263-300, p_losses:392-419)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff3dhpe_tpu.diffusion import GaussianDiffusion, ddim_time_pairs
from diff3dhpe_tpu.engine import make_denoise_fn


class LinearToyModel:
    """Deterministic stand-in denoiser: x0_hat = W * noisy_3d + b(t).

    Mimics the model interface; ignores params, keys; depends on the 2D
    condition and diffusion time so conditioning/time plumbing is exercised.
    """

    def __call__(self, params, x, t, key=None):
        cond, noisy = x[..., :2], x[..., 2:]
        mix = 0.9 * noisy + 0.05 * jnp.concatenate(
            [cond, cond[..., :1]], axis=-1
        )
        return mix + 0.001 * t[:, None, None, None]


def make_engine(mode="s2s", T=40, S=5, eta=0.0, clip_denoised=False, clip_loss=False):
    return GaussianDiffusion.create(
        LinearToyModel(),
        timesteps=T,
        sampling_timesteps=S,
        loss_type="l2",
        clip_denoised=clip_denoised,
        beta_schedule="cosine",
        ddim_sampling_eta=eta,
        clip_loss=clip_loss,
        mode=mode,
    )


def test_q_sample_formula(rng):
    eng = make_engine()
    x0 = jnp.asarray(rng.standard_normal((3, 5, 17, 3)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((3, 5, 17, 3)), jnp.float32)
    t = jnp.array([0, 17, 39])
    xt = eng.q_sample(x0, t, noise)
    c = eng.constants
    for i, ti in enumerate([0, 17, 39]):
        expected = c.sqrt_alphas_cumprod[ti] * x0[i] + c.sqrt_one_minus_alphas_cumprod[ti] * noise[i]
        np.testing.assert_allclose(xt[i], expected, rtol=1e-6)


def test_q_sample_endpoints(rng):
    # t=0 is nearly clean; late t is nearly pure noise (cosine schedule).
    eng = make_engine(T=1000)
    x0 = jnp.asarray(rng.standard_normal((1, 2, 17, 3)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((1, 2, 17, 3)), jnp.float32)
    early = eng.q_sample(x0, jnp.array([0]), noise)
    late = eng.q_sample(x0, jnp.array([999]), noise)
    assert np.abs(early - x0).mean() < 0.05
    assert np.abs(np.asarray(late) - np.asarray(noise)).mean() < 0.05


@pytest.mark.parametrize("eta,clip", [(0.0, False), (0.0, True), (0.5, False)])
def test_ddim_loop_matches_python_reference(eta, clip):
    """Replicate the reference's Python ddim loop step by step with identical
    PRNG draws and compare against the single-scan implementation."""
    T, S = 40, 5
    eng = make_engine(T=T, S=S, eta=eta, clip_denoised=clip)
    key = jax.random.PRNGKey(7)
    b, f, j = 2, 4, 17
    cond = jax.random.normal(jax.random.PRNGKey(3), (b, f, j, 2))
    target_shape = (b, f, j, 3)

    ours = eng.ddim_sample_loop(None, key, cond, target_shape)

    # Python replication with the same key discipline: per-row draws from
    # fold_in(key, row_index) so results are mesh-sharding-invariant.
    c = eng.constants
    row_shape = target_shape[1:]
    key_init, key_steps = jax.random.split(key)
    x = jnp.stack([
        jax.random.normal(jax.random.fold_in(key_init, i), row_shape, jnp.float32)
        for i in range(b)
    ])
    pairs = ddim_time_pairs(T, S)
    model = LinearToyModel()
    for i, (t, t_next) in enumerate(pairs):
        x_start = model(None, jnp.concatenate([cond, x], axis=-1),
                        jnp.full((b,), float(t), jnp.float32))
        if clip:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        if t_next < 0:
            x = x_start
            continue
        alpha = float(c.alphas_cumprod[t])
        alpha_next = float(c.alphas_cumprod[t_next])
        sqrt_om = float(c.sqrt_one_minus_alphas_cumprod[t])
        sigma = eta * np.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
        coef = np.sqrt(1 - alpha_next - sigma ** 2)
        noise = jnp.stack([
            jax.random.normal(
                jax.random.fold_in(jax.random.fold_in(key_steps, i), r),
                row_shape, x.dtype,
            )
            for r in range(b)
        ])
        # NOTE: the reference multiplies x_start by alpha (NOT sqrt(alpha))
        # in the eps-extraction term (reference :296); we reproduce that.
        x = (
            x_start * np.float32(np.sqrt(alpha_next))
            + np.float32(coef) * ((x - np.float32(alpha) * x_start) / np.float32(sqrt_om))
            + np.float32(sigma) * noise
        )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(x), rtol=2e-5, atol=2e-6)


def test_ddim_deterministic_given_key():
    eng = make_engine()
    key = jax.random.PRNGKey(0)
    cond = jnp.zeros((1, 4, 17, 2))
    a = eng.ddim_sample_loop(None, key, cond, (1, 4, 17, 3))
    b = eng.ddim_sample_loop(None, key, cond, (1, 4, 17, 3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = eng.ddim_sample_loop(None, jax.random.PRNGKey(1), cond, (1, 4, 17, 3))
    assert not np.allclose(a, c)


def test_per_row_noise_distinct_and_row_index_consistent():
    """x_T is drawn per row from fold_in(key, row_index): identical
    conditioning rows get distinct noise, and sampling a sub-batch with its
    global row indices bit-matches the corresponding rows of the full run
    (the property that makes mesh-sharded eval invariant to mesh size)."""
    eng = make_engine()
    key = jax.random.PRNGKey(5)
    cond = jnp.zeros((4, 4, 17, 2))
    full = eng.ddim_sample_loop(None, key, cond, (4, 4, 17, 3))
    assert not np.allclose(np.asarray(full[0]), np.asarray(full[1]))
    part = eng.ddim_sample_loop(
        None, key, cond[2:], (2, 4, 17, 3), row_index=jnp.arange(2, 4)
    )
    np.testing.assert_array_equal(np.asarray(part), np.asarray(full[2:]))


def test_p_losses_formula(rng):
    eng = make_engine(T=40, clip_loss=True)
    key = jax.random.PRNGKey(11)
    x0 = jnp.asarray(rng.standard_normal((4, 4, 17, 3)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((4, 4, 17, 2)), jnp.float32)

    loss = eng.p_losses(None, key, x0, cond)
    assert loss.shape == x0.shape

    # Recompute with the same internal key discipline.
    key_t, key_noise = jax.random.split(key)
    t = jax.random.randint(key_t, (4,), 0, 40)
    noise = jax.random.normal(key_noise, x0.shape, x0.dtype)
    x_noisy = eng.q_sample(x0, t, noise)
    model_out = LinearToyModel()(None, jnp.concatenate([cond, x_noisy], -1),
                                 t.astype(jnp.float32))
    c = eng.constants
    coef = 1.0 + c.alphas_cumprod[np.asarray(t)] / c.sqrt_one_minus_alphas_cumprod[np.asarray(t)]
    coef = np.minimum(coef, 3.0)[:, None, None, None]
    expected = np.asarray((model_out - x0) ** 2) * coef
    np.testing.assert_allclose(np.asarray(loss), expected, rtol=1e-5)


def test_p_losses_clip_loss_caps_weight():
    # At small t the weight 1 + acp/sqrt(1-acp) explodes; clip_loss caps at 3.
    eng = make_engine(T=1000, clip_loss=True)
    c = eng.constants
    w = 1.0 + c.alphas_cumprod / c.sqrt_one_minus_alphas_cumprod
    assert w.max() > 3.0  # uncapped would exceed
    # verified capped inside p_losses via formula test above


def test_multi_hypothesis_shapes():
    eng = make_engine()
    key = jax.random.PRNGKey(0)
    cond = jnp.zeros((2, 4, 17, 2))
    pred = eng.estimate_pose(None, key, cond, (2, 4, 17, 3), repeat_n=3)
    assert pred.shape == (2, 4, 17, 3)
    # hypothesis mean differs from single-hypothesis sample
    single = eng.estimate_pose(None, key, cond, (2, 4, 17, 3), repeat_n=1)
    assert not np.allclose(pred, single)


def test_s2f_loop_shapes():
    eng = make_engine(mode="s2f")

    class S2FToy:
        def __call__(self, params, x, t, key=None):
            out = x[..., 2:] * 0.9
            return out[:, :1]  # [B,1,J,3]

    eng = GaussianDiffusion.create(
        S2FToy(), timesteps=40, sampling_timesteps=5, mode="s2f",
        beta_schedule="cosine",
    )
    pred = eng.ddim_sample_loop(None, jax.random.PRNGKey(0),
                                jnp.zeros((2, 9, 17, 2)), (2, 1, 17, 3))
    assert pred.shape == (2, 1, 17, 3)


def test_collect_chain_shapes():
    eng = make_engine(T=40, S=5)
    final, states, x0s = eng.ddim_sample_loop(
        None, jax.random.PRNGKey(0), jnp.zeros((1, 4, 17, 2)), (1, 4, 17, 3),
        collect_chain=True,
    )
    assert states.shape == (1, 4, 17, 3, 5)
    assert x0s.shape == (1, 4, 17, 3, 5)
    np.testing.assert_array_equal(np.asarray(final), np.asarray(states[..., -1]))


def test_p_sample_loop_runs():
    eng = make_engine(T=10, S=10)
    out = eng.p_sample_loop(None, jax.random.PRNGKey(0),
                            jnp.zeros((1, 4, 17, 2)), (1, 4, 17, 3))
    assert out.shape == (1, 4, 17, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_get_noisy_pose_chain(rng):
    eng = make_engine(T=40)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 17, 3)), jnp.float32)
    chain, t_list = eng.get_noisy_pose(x0, num_sample=8, key=jax.random.PRNGKey(0))
    assert chain.shape == (2, 4, 17, 3, 8)
    assert t_list == list(range(0, 40, 5))


def test_final_denoise_fn_split_matches_single_scan():
    """final_denoise_fn == denoise_fn must reproduce the single-scan loop:
    the mixed-precision split (unrolled trailing steps) changes scheduling
    only, not the update math — including eta>0 per-step noise indexing."""
    import dataclasses

    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 17, 2))
    for eta, n_final in [(0.0, 1), (0.0, 2), (0.5, 2), (0.0, 5)]:
        eng = make_engine(T=40, S=5, eta=eta)
        split = dataclasses.replace(
            eng, final_denoise_fn=eng.denoise_fn, final_denoise_steps=n_final
        )
        key = jax.random.PRNGKey(7)
        a = eng.ddim_sample_loop(None, key, cond, (2, 4, 17, 3))
        b = split.ddim_sample_loop(None, key, cond, (2, 4, 17, 3))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
            err_msg=f"eta={eta} n_final={n_final}",
        )


def test_final_denoise_fn_applies_to_trailing_steps_only():
    """With a distinct final_denoise_fn, the collected chain's x0 estimates
    match the base engine on the scanned prefix and diverge exactly on the
    last final_denoise_steps steps."""
    import dataclasses

    S, n_final = 5, 2
    eng = make_engine(T=40, S=S)
    base = LinearToyModel()

    def offset_fn(params, x, t, key=None):
        return base(params, x, t, key) + 0.25

    split = dataclasses.replace(
        eng, final_denoise_fn=offset_fn, final_denoise_steps=n_final
    )
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 17, 2))
    _, _, x0_base = eng.ddim_sample_loop(
        None, key, cond, (1, 4, 17, 3), collect_chain=True
    )
    final, states, x0_split = split.ddim_sample_loop(
        None, key, cond, (1, 4, 17, 3), collect_chain=True
    )
    assert x0_split.shape == x0_base.shape
    # Scanned prefix identical; first unrolled step differs by the offset
    # exactly (same trajectory input), the one after compounds.
    np.testing.assert_allclose(
        np.asarray(x0_split[..., : S - n_final]),
        np.asarray(x0_base[..., : S - n_final]), rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(x0_split[..., S - n_final]),
        np.asarray(x0_base[..., S - n_final]) + 0.25, rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(final), np.asarray(states[..., -1]))
