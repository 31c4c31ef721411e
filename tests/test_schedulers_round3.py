"""Round-3 scheduler additions vs the torch reference: SDE-VE, aMUSEd,
cosine SDE-DPM++ (Stable Audio), flow-match LCM, consistency decoder."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

from tests.test_schedulers_vs_reference import dummy_sample_deter


def _import_torch_cosine():
    """torchsde is not installed; the reference class only needs it for its
    default Brownian noise sampler, which the test replaces — stub the module."""
    import importlib.machinery
    import types

    if "torchsde" not in sys.modules:
        fake = types.ModuleType("torchsde")
        fake.BrownianInterval = object
        fake.BrownianTree = object
        fake.__spec__ = importlib.machinery.ModuleSpec("torchsde", None)
        sys.modules["torchsde"] = fake
    from diffusers.schedulers.scheduling_cosine_dpmsolver_multistep import (
        CosineDPMSolverMultistepScheduler,
    )

    return CosineDPMSolverMultistepScheduler


def test_cosine_dpmsolver_matches_reference():
    torch = pytest.importorskip("torch")
    TorchCos = _import_torch_cosine()

    from diffusers_tpu.schedulers import CosineDPMSolverMultistepScheduler

    cfg = dict(sigma_min=0.3, sigma_max=500, sigma_data=1.0, sigma_schedule="exponential",
               prediction_type="v_prediction")
    num_steps = 10
    noise_seq = [np.random.RandomState(100 + i).randn(*dummy_sample_deter().shape).astype(np.float32)
                 for i in range(num_steps)]

    class FakeSampler:
        def __init__(self, seq):
            self.seq = list(seq)
            self.i = 0

        def __call__(self, s0, s1):
            n = self.seq[self.i]
            self.i += 1
            return torch.from_numpy(n)

    ref_s = TorchCos(**cfg)
    ref_s.set_timesteps(num_steps)
    ref_s.noise_sampler = FakeSampler(noise_seq)
    sample_t = torch.from_numpy(dummy_sample_deter()) * ref_s.init_noise_sigma
    for i, t in enumerate(ref_s.timesteps):
        inp = ref_s.scale_model_input(sample_t, t)
        residual = inp * float(t) / (float(t) + 1)
        sample_t = ref_s.step(residual, t, sample_t).prev_sample
    ref = sample_t.numpy()

    ours_s = CosineDPMSolverMultistepScheduler(**cfg)
    state = ours_s.set_timesteps(num_steps)
    sample = jnp.asarray(dummy_sample_deter()) * state.init_noise_sigma
    for i, t in enumerate(np.asarray(state.timesteps)):
        inp = ours_s.scale_model_input(state, sample, t)
        residual = inp * t / (t + 1)
        out = ours_s.step(state, residual, t, sample, variance_noise=jnp.asarray(noise_seq[i]))
        sample, state = out.prev_sample, out.state
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_flow_match_lcm_matches_reference():
    torch = pytest.importorskip("torch")
    from diffusers import FlowMatchLCMScheduler as TorchLCM

    from diffusers_tpu.schedulers import FlowMatchLCMScheduler

    cfg = dict(shift=3.0)
    num_steps = 6
    noise_seq = [np.random.RandomState(7 + i).randn(*dummy_sample_deter().shape).astype(np.float32)
                 for i in range(num_steps)]

    import diffusers.schedulers.scheduling_flow_match_lcm as M

    ref_s = TorchLCM(**cfg)
    ref_s.set_timesteps(num_steps)
    sample_t = torch.from_numpy(dummy_sample_deter())
    for i, t in enumerate(ref_s.timesteps):
        residual = sample_t * float(t) / (float(t) + 1)
        M.randn_tensor = lambda shape, generator=None, device=None, dtype=None, _n=noise_seq[i]: torch.from_numpy(_n)
        sample_t = ref_s.step(residual, t, sample_t).prev_sample
    ref = sample_t.numpy()

    ours_s = FlowMatchLCMScheduler(**cfg)
    state = ours_s.set_timesteps(num_steps)
    sample = jnp.asarray(dummy_sample_deter())
    for i, t in enumerate(np.asarray(state.timesteps)):
        residual = sample * t / (t + 1)
        out = ours_s.step(state, residual, t, sample, variance_noise=jnp.asarray(noise_seq[i]))
        sample = out.prev_sample
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_sde_ve_matches_reference():
    torch = pytest.importorskip("torch")
    from diffusers import ScoreSdeVeScheduler as TorchVe

    from diffusers_tpu.schedulers import ScoreSdeVeScheduler

    cfg = dict(num_train_timesteps=100, snr=0.15, sigma_min=0.01, sigma_max=100.0, sampling_eps=1e-3)
    num_steps = 5
    shape = dummy_sample_deter().shape
    pred_noise = [np.random.RandomState(i).randn(*shape).astype(np.float32) for i in range(num_steps)]
    corr_noise = [np.random.RandomState(50 + i).randn(*shape).astype(np.float32) for i in range(num_steps)]

    import diffusers.schedulers.scheduling_sde_ve as M

    ref_s = TorchVe(**cfg)
    ref_s.set_timesteps(num_steps)
    ref_s.set_sigmas(num_steps)
    sample_t = torch.from_numpy(dummy_sample_deter()) * cfg["sigma_max"]
    for i, t in enumerate(ref_s.timesteps):
        score = -sample_t * 0.01
        M.randn_tensor = lambda shape, layout=None, generator=None, device=None, dtype=None, _n=corr_noise[i]: torch.from_numpy(_n)
        sample_t = ref_s.step_correct(score, sample_t).prev_sample
        M.randn_tensor = lambda shape, layout=None, generator=None, device=None, dtype=None, _n=pred_noise[i]: torch.from_numpy(_n)
        sample_t = ref_s.step_pred(score, t, sample_t).prev_sample
    ref = sample_t.numpy()

    ours_s = ScoreSdeVeScheduler(**cfg)
    state = ours_s.set_timesteps(num_steps)
    sample = jnp.asarray(dummy_sample_deter()) * cfg["sigma_max"]
    for i, t in enumerate(np.asarray(state.timesteps)):
        score = -sample * 0.01
        sample = ours_s.step_correct(state, score, sample, noise=jnp.asarray(corr_noise[i])).prev_sample
        sample = ours_s.step_pred(state, score, t, sample, noise=jnp.asarray(pred_noise[i])).prev_sample
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-2 * max(1.0, np.abs(ref).max() * 1e-3), np.max(np.abs(ref - ours))
    assert np.allclose(ref, ours, rtol=1e-4, atol=1e-3)


def test_consistency_decoder_matches_reference():
    torch = pytest.importorskip("torch")
    from diffusers.schedulers import ConsistencyDecoderScheduler as TorchCD

    from diffusers_tpu.schedulers import ConsistencyDecoderScheduler

    shape = dummy_sample_deter().shape
    noise = np.random.RandomState(3).randn(*shape).astype(np.float32)

    import diffusers.schedulers.scheduling_consistency_decoder as M

    ref_s = TorchCD()
    ref_s.set_timesteps(2)
    sample_t = torch.from_numpy(dummy_sample_deter()) * ref_s.init_noise_sigma
    M.randn_tensor = lambda shape, generator=None, device=None, dtype=None: torch.from_numpy(noise)
    for t in ref_s.timesteps:
        inp = ref_s.scale_model_input(sample_t, t)
        residual = inp * 0.1
        sample_t = ref_s.step(residual, t, sample_t).prev_sample
    ref = sample_t.numpy()

    ours_s = ConsistencyDecoderScheduler()
    state = ours_s.set_timesteps(2)
    sample = jnp.asarray(dummy_sample_deter()) * state.init_noise_sigma
    for t in np.asarray(state.timesteps):
        inp = ours_s.scale_model_input(state, sample, t)
        residual = inp * 0.1
        sample = ours_s.step(state, residual, t, sample, variance_noise=jnp.asarray(noise)).prev_sample
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_amused_matches_reference_deterministic_parts():
    """The multinomial/Gumbel draws can't match across frameworks; verify the
    deterministic plumbing instead: schedule tables, mask counts, and that the
    final step fully unmasks."""
    torch = pytest.importorskip("torch")
    from diffusers import AmusedScheduler as TorchAmused

    from diffusers_tpu.schedulers import AmusedScheduler

    ref_s = TorchAmused(mask_token_id=8)
    ref_s.set_timesteps(6)
    ours_s = AmusedScheduler(mask_token_id=8)
    state = ours_s.set_timesteps(6)
    assert np.array_equal(np.asarray(state.timesteps), ref_s.timesteps.numpy())
    assert np.allclose(np.asarray(state.temperatures), ref_s.temperatures.numpy())

    rng = np.random.RandomState(0)
    B, S, V = 2, 16, 8
    logits_np = rng.randn(B, S, V + 1).astype(np.float32)
    logits_np[..., 8] = -1e9  # the model never predicts the mask token itself
    logits = jnp.asarray(logits_np)
    sample = jnp.full((B, S), 8, jnp.int32)  # all masked
    key = jax.random.PRNGKey(0)

    out = ours_s.step(state, logits, int(np.asarray(state.timesteps)[0]), sample, key=key)
    prev = np.asarray(out.prev_sample)
    # cosine schedule at step 0 of 6: mask_ratio = cos(pi/12) -> floor(16 * .966)=15
    assert ((prev == 8).sum(axis=-1) == 15).all()
    # final timestep (0) returns the fully unmasked prediction
    out_last = ours_s.step(state, logits, 0, sample, key=key)
    assert not (np.asarray(out_last.prev_sample) == 8).any()
