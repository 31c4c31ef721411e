"""Parity tests for the round-3 scheduler additions: LTX Euler-Ancestral RF,
MiniMax-H3, VQ-Diffusion, inverse DPM-Solver++ multistep.

Reference: `/root/reference/src/diffusers/schedulers/scheduling_ltx_euler_ancestral_rf.py:51`,
`scheduling_minimax_h3.py:55`, `scheduling_vq_diffusion.py:142`,
`scheduling_dpmsolver_multistep_inverse.py:283`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")


@pytest.mark.refparity
def test_ltx_euler_ancestral_rf_parity():
    torch = pytest.importorskip("torch")
    from diffusers import LTXEulerAncestralRFScheduler as TorchSched

    from diffusers_tpu.schedulers import LTXEulerAncestralRFScheduler

    sigmas = [1.0, 0.85, 0.6, 0.35, 0.15, 0.0]
    # deterministic check: eta=0 disables the ancestral noise entirely
    ref_s = TorchSched(eta=0.0)
    ours = LTXEulerAncestralRFScheduler(eta=0.0)
    ref_s.set_timesteps(sigmas=list(sigmas))
    state = ours.set_timesteps(sigmas=list(sigmas))
    np.testing.assert_allclose(np.asarray(state.sigmas), ref_s.sigmas.numpy(), rtol=1e-6)

    rng = np.random.RandomState(0)
    s_ref = torch.from_numpy(rng.randn(1, 4, 6, 6).astype(np.float32))
    s_ours = jnp.asarray(s_ref.numpy())
    for i, t in enumerate(ref_s.timesteps):
        pred = rng.randn(1, 4, 6, 6).astype(np.float32)
        s_ref = ref_s.step(torch.from_numpy(pred), t, s_ref).prev_sample
        out = ours.step(state, jnp.asarray(pred), state.timesteps[i], s_ours)
        s_ours, state = out.prev_sample, out.state
    np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy(), rtol=1e-4, atol=1e-5)

    # stochastic path: finite + actually noised
    ours2 = LTXEulerAncestralRFScheduler(eta=1.0)
    st = ours2.set_timesteps(sigmas=list(sigmas))
    x = jnp.asarray(rng.randn(1, 4, 6, 6).astype(np.float32))
    out = ours2.step(st, jnp.asarray(rng.randn(1, 4, 6, 6).astype(np.float32)),
                     st.timesteps[0], x, key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out.prev_sample)).all()

    # flow-match delegation path
    st3 = ours2.set_timesteps(num_inference_steps=4)
    assert st3.sigmas.shape[0] == 5


@pytest.mark.refparity
def test_minimax_h3_parity():
    torch = pytest.importorskip("torch")
    from diffusers import MiniMaxH3Scheduler as TorchSched

    from diffusers_tpu.schedulers import MiniMaxH3Scheduler

    for shift in (12.0, 3.0):
        ref_s = TorchSched(shift=shift)
        ours = MiniMaxH3Scheduler(shift=shift)
        ref_s.set_timesteps(6)
        state = ours.set_timesteps(6)
        np.testing.assert_allclose(np.asarray(state.sigmas), ref_s.sigmas.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(state.timesteps), ref_s.timesteps.numpy(), rtol=1e-6)

        rng = np.random.RandomState(int(shift))
        s_ref = torch.from_numpy(rng.randn(1, 4, 8).astype(np.float32))
        s_ours = jnp.asarray(s_ref.numpy())
        for i, t in enumerate(ref_s.timesteps):
            pred = rng.randn(1, 4, 8).astype(np.float32)
            s_ref = ref_s.step(torch.from_numpy(pred), t, s_ref).prev_sample
            out = ours.step(state, jnp.asarray(pred), state.timesteps[i], s_ours)
            s_ours, state = out.prev_sample, out.state
        np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy(), rtol=1e-4, atol=1e-5)

    # scale_noise parity
    ref_s = TorchSched()
    ours = MiniMaxH3Scheduler()
    rng = np.random.RandomState(7)
    x0 = rng.randn(2, 3, 4).astype(np.float32)
    noise = rng.randn(2, 3, 4).astype(np.float32)
    ref = ref_s.scale_noise(torch.from_numpy(x0), torch.tensor([0.3, 0.8]),
                            torch.from_numpy(noise)).numpy()
    out = np.asarray(ours.scale_noise(jnp.asarray(x0), jnp.asarray([0.3, 0.8]), jnp.asarray(noise)))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


@pytest.mark.refparity
def test_vq_diffusion_parity():
    torch = pytest.importorskip("torch")
    from diffusers.schedulers import VQDiffusionScheduler as TorchSched

    from diffusers_tpu.schedulers import VQDiffusionScheduler

    K, T, N, B = 10, 20, 12, 2
    ref_s = TorchSched(num_vec_classes=K, num_train_timesteps=T)
    ours = VQDiffusionScheduler(num_vec_classes=K, num_train_timesteps=T)
    ref_s.set_timesteps(T)
    state = ours.set_timesteps(T)

    rng = np.random.RandomState(0)
    x_t = rng.randint(0, K, (B, N)).astype(np.int64)
    x_t[0, :4] = K - 1  # some masked positions
    logits = np.log(np.clip(rng.dirichlet(np.ones(K - 1), (B, N)).transpose(0, 2, 1), 1e-30, None)).astype(np.float32)

    # q_posterior parity at a few timesteps
    for t in (1, 7, 19):
        ref = ref_s.q_posterior(torch.from_numpy(logits), torch.from_numpy(x_t), t).numpy()
        out = np.asarray(ours.q_posterior(jnp.asarray(logits), jnp.asarray(x_t), t))
        finite = np.isfinite(ref) & (ref > -1e29)
        np.testing.assert_allclose(out[finite], ref[finite], rtol=1e-3, atol=1e-4)

    # full sampling run stays in range and is finite
    sample = jnp.asarray(x_t)
    for i, t in enumerate(np.asarray(state.timesteps)):
        out = ours.step(state, jnp.asarray(logits), int(t), sample,
                        key=jax.random.PRNGKey(i))
        sample, state = out.prev_sample, out.state
    s = np.asarray(sample)
    assert s.min() >= 0 and s.max() < K


@pytest.mark.refparity
@pytest.mark.parametrize("spacing", ["linspace", "leading"])
def test_dpmsolver_inverse_parity(spacing):
    torch = pytest.importorskip("torch")
    from diffusers import DPMSolverMultistepInverseScheduler as TorchSched

    from diffusers_tpu.schedulers import DPMSolverMultistepInverseScheduler

    cfg = dict(num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
               beta_schedule="scaled_linear", solver_order=2, prediction_type="epsilon",
               timestep_spacing=spacing)
    ref_s = TorchSched(**cfg)
    ours = DPMSolverMultistepInverseScheduler(**cfg)
    n = 8
    ref_s.set_timesteps(n)
    state = ours.set_timesteps(n, sample_shape=(1, 4, 6, 6))
    np.testing.assert_array_equal(np.asarray(state.timesteps), ref_s.timesteps.numpy())
    np.testing.assert_allclose(np.asarray(state.sigmas), ref_s.sigmas.numpy(), rtol=1e-5)

    rng = np.random.RandomState(0)
    s_ref = torch.from_numpy(rng.randn(1, 4, 6, 6).astype(np.float32))
    s_ours = jnp.asarray(s_ref.numpy())
    for i, t in enumerate(ref_s.timesteps):
        pred = rng.randn(1, 4, 6, 6).astype(np.float32)
        s_ref = ref_s.step(torch.from_numpy(pred), t, s_ref).prev_sample
        out = ours.step(state, jnp.asarray(pred), state.timesteps[i], s_ours)
        s_ours, state = out.prev_sample, out.state
    np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy(), rtol=2e-3, atol=2e-3)
