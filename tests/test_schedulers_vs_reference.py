"""Cross-check functional schedulers against the torch reference
implementations on identical full loops (10 steps, deterministic model)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")


def dummy_sample_deter():
    batch_size, num_channels, height, width = 4, 3, 8, 8
    num_elems = batch_size * num_channels * height * width
    sample = np.arange(num_elems, dtype=np.float32)
    return (sample.reshape(num_channels, height, width, batch_size) / num_elems).transpose(3, 0, 1, 2)


def run_reference(torch_cls, config, num_steps=10, scale_input=False):
    import torch

    sch = torch_cls(**config)
    sch.set_timesteps(num_steps)
    sample = torch.from_numpy(dummy_sample_deter())
    if scale_input:
        sample = sample * sch.init_noise_sigma
    for t in sch.timesteps:
        inp = sch.scale_model_input(sample, t)
        residual = inp * t / (t + 1)
        sample = sch.step(residual, t, sample).prev_sample
    return sample.numpy()


def run_ours(cls, config, num_steps=10, scale_input=False):
    sch = cls(**config)
    state = sch.set_timesteps(num_steps)
    sample = jnp.asarray(dummy_sample_deter())
    if scale_input:
        sample = sample * state.init_noise_sigma
    for t in np.asarray(state.timesteps):
        inp = sch.scale_model_input(state, sample, t)
        residual = inp * t / (t + 1)
        out = sch.step(state, residual, t, sample)
        sample = out.prev_sample
        state = out.state if out.state is not None else state
    return np.asarray(sample)


def test_pndm_plms_matches_reference():
    from diffusers import PNDMScheduler as TorchPNDM

    from diffusers_tpu.schedulers import PNDMScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear", skip_prk_steps=True,
               set_alpha_to_one=False, steps_offset=1)
    ref = run_reference(TorchPNDM, cfg)
    ours = run_ours(PNDMScheduler, cfg)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_lms_matches_reference():
    from diffusers import LMSDiscreteScheduler as TorchLMS

    from diffusers_tpu.schedulers import LMSDiscreteScheduler

    cfg = dict(beta_start=0.0001, beta_end=0.02, beta_schedule="linear")
    ref = run_reference(TorchLMS, cfg, scale_input=True)
    ours = run_ours(LMSDiscreteScheduler, cfg, scale_input=True)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_heun_matches_reference():
    from diffusers import HeunDiscreteScheduler as TorchHeun

    from diffusers_tpu.schedulers import HeunDiscreteScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")
    ref = run_reference(TorchHeun, cfg, scale_input=True)
    ours = run_ours(HeunDiscreteScheduler, cfg, scale_input=True)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_lcm_matches_reference():
    import torch

    from diffusers import LCMScheduler as TorchLCM

    from diffusers_tpu.schedulers import LCMScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")
    num_steps = 4

    sch_t = TorchLCM(**cfg)
    sch_t.set_timesteps(num_steps)
    sample_t = torch.from_numpy(dummy_sample_deter())
    gen = torch.manual_seed(0)
    noises = []
    for t in sch_t.timesteps:
        residual = sample_t * t / (t + 1)
        noises.append(torch.randn(sample_t.shape, generator=gen))
        # inject the same noise stream by temporarily monkey-patching? Instead
        # compare deterministic final step only: run with generator
        sample_t = sch_t.step(residual, t, sample_t, generator=torch.manual_seed(42)).prev_sample
    ref = sample_t.numpy()

    sch = LCMScheduler(**cfg)
    state = sch.set_timesteps(num_steps)
    sample = jnp.asarray(dummy_sample_deter())
    for t in np.asarray(state.timesteps):
        residual = sample * t / (t + 1)
        noise = jnp.asarray(torch.randn(tuple(sample.shape), generator=torch.manual_seed(42)).numpy())
        out = sch.step(state, residual, t, sample, variance_noise=noise)
        sample = out.prev_sample
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_euler_ancestral_matches_reference():
    import torch

    from diffusers import EulerAncestralDiscreteScheduler as TorchEA

    from diffusers_tpu.schedulers import EulerAncestralDiscreteScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")
    num_steps = 10

    sch_t = TorchEA(**cfg)
    sch_t.set_timesteps(num_steps)
    sample_t = torch.from_numpy(dummy_sample_deter()) * sch_t.init_noise_sigma
    for t in sch_t.timesteps:
        inp = sch_t.scale_model_input(sample_t, t)
        residual = inp * t / (t + 1)
        sample_t = sch_t.step(residual, t, sample_t, generator=torch.manual_seed(7)).prev_sample
    ref = sample_t.numpy()

    sch = EulerAncestralDiscreteScheduler(**cfg)
    state = sch.set_timesteps(num_steps)
    sample = jnp.asarray(dummy_sample_deter()) * state.init_noise_sigma
    for t in np.asarray(state.timesteps):
        inp = sch.scale_model_input(state, sample, t)
        residual = inp * t / (t + 1)
        noise = jnp.asarray(torch.randn(tuple(sample.shape), generator=torch.manual_seed(7)).numpy())
        sample = sch.step(state, residual, t, sample, variance_noise=noise).prev_sample
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_unipc_matches_reference():
    from diffusers import UniPCMultistepScheduler as TorchUniPC

    from diffusers_tpu.schedulers import UniPCMultistepScheduler

    cfg = dict(beta_start=0.0001, beta_end=0.02, beta_schedule="linear", solver_order=2)
    ref = run_reference(TorchUniPC, cfg)
    ours = run_ours(UniPCMultistepScheduler, cfg)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_unipc_flow_sigmas_matches_reference():
    from diffusers import UniPCMultistepScheduler as TorchUniPC

    from diffusers_tpu.schedulers import UniPCMultistepScheduler

    cfg = dict(prediction_type="flow_prediction", use_flow_sigmas=True, flow_shift=3.0, solver_order=2)
    ref = run_reference(TorchUniPC, cfg)
    ours = run_ours(UniPCMultistepScheduler, cfg)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_dpm_flow_sigmas_matches_reference():
    from diffusers import DPMSolverMultistepScheduler as TorchDPM

    from diffusers_tpu.schedulers import DPMSolverMultistepScheduler

    cfg = dict(prediction_type="flow_prediction", use_flow_sigmas=True, flow_shift=3.0, solver_order=2)
    ref = run_reference(TorchDPM, cfg)
    ours = run_ours(DPMSolverMultistepScheduler, cfg)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_deis_matches_reference():
    from diffusers import DEISMultistepScheduler as TorchDEIS

    from diffusers_tpu.schedulers import DEISMultistepScheduler

    cfg = dict(beta_start=0.0001, beta_end=0.02, beta_schedule="linear", solver_order=2)
    ref = run_reference(TorchDEIS, cfg)
    ours = run_ours(DEISMultistepScheduler, cfg)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_tcd_matches_reference():
    import torch

    from diffusers import TCDScheduler as TorchTCD

    from diffusers_tpu.schedulers import TCDScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")
    num_steps = 4

    sch_t = TorchTCD(**cfg)
    sch_t.set_timesteps(num_steps)
    sample_t = torch.from_numpy(dummy_sample_deter())
    for t in sch_t.timesteps:
        residual = sample_t * t / (t + 1)
        sample_t = sch_t.step(residual, t, sample_t, eta=0.3, generator=torch.manual_seed(11)).prev_sample
    ref = sample_t.numpy()

    sch = TCDScheduler(**cfg)
    state = sch.set_timesteps(num_steps)
    sample = jnp.asarray(dummy_sample_deter())
    for t in np.asarray(state.timesteps):
        residual = sample * t / (t + 1)
        noise = jnp.asarray(torch.randn(tuple(sample.shape), generator=torch.manual_seed(11)).numpy())
        sample = sch.step(state, residual, t, sample, eta=0.3, variance_noise=noise).prev_sample
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_ddim_inverse_matches_reference():
    from diffusers import DDIMInverseScheduler as TorchInv

    from diffusers_tpu.schedulers import DDIMInverseScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear", clip_sample=False)
    ref = run_reference(TorchInv, cfg)
    ours = run_ours(DDIMInverseScheduler, cfg)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_edm_euler_matches_reference():
    from diffusers import EDMEulerScheduler as TorchEDM

    from diffusers_tpu.schedulers import EDMEulerScheduler

    cfg = dict(sigma_min=0.002, sigma_max=80.0, sigma_data=0.5)
    ref = run_reference(TorchEDM, cfg, scale_input=True)
    ours = run_ours(EDMEulerScheduler, cfg, scale_input=True)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_kdpm2_matches_reference():
    from diffusers import KDPM2DiscreteScheduler as TorchK

    from diffusers_tpu.schedulers import KDPM2DiscreteScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")
    ref = run_reference(TorchK, cfg, scale_input=True)
    ours = run_ours(KDPM2DiscreteScheduler, cfg, scale_input=True)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_dpmsolver_singlestep_matches_reference():
    from diffusers import DPMSolverSinglestepScheduler as TorchSS

    from diffusers_tpu.schedulers import DPMSolverSinglestepScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")
    ref = run_reference(TorchSS, cfg)
    ours = run_ours(DPMSolverSinglestepScheduler, cfg)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_dpmsolver_singlestep_lower_order_final_karras():
    from diffusers import DPMSolverSinglestepScheduler as TorchSS

    from diffusers_tpu.schedulers import DPMSolverSinglestepScheduler

    cfg = dict(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        lower_order_final=True, use_karras_sigmas=True, final_sigmas_type="sigma_min",
    )
    ref = run_reference(TorchSS, cfg, num_steps=9)
    ours = run_ours(DPMSolverSinglestepScheduler, cfg, num_steps=9)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_ipndm_matches_reference():
    from diffusers import IPNDMScheduler as TorchIPNDM

    from diffusers_tpu.schedulers import IPNDMScheduler

    ref = run_reference(TorchIPNDM, {})
    ours = run_ours(IPNDMScheduler, {})
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_kdpm2_ancestral_matches_reference():
    import torch

    from diffusers import KDPM2AncestralDiscreteScheduler as TorchK

    from diffusers_tpu.schedulers import KDPM2AncestralDiscreteScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")
    num_steps = 10

    sch_t = TorchK(**cfg)
    sch_t.set_timesteps(num_steps)
    sample_t = torch.from_numpy(dummy_sample_deter()) * sch_t.init_noise_sigma
    for t in sch_t.timesteps:
        inp = sch_t.scale_model_input(sample_t, t)
        residual = inp * t / (t + 1)
        sample_t = sch_t.step(residual, t, sample_t, generator=torch.manual_seed(11)).prev_sample
    ref = sample_t.numpy()

    sch = KDPM2AncestralDiscreteScheduler(**cfg)
    state = sch.set_timesteps(num_steps)
    sample = jnp.asarray(dummy_sample_deter()) * state.init_noise_sigma
    for t in np.asarray(state.timesteps):
        inp = sch.scale_model_input(state, sample, t)
        residual = inp * t / (t + 1)
        noise = jnp.asarray(torch.randn(tuple(sample.shape), generator=torch.manual_seed(11)).numpy())
        out = sch.step(state, residual, t, sample, variance_noise=noise)
        sample, state = out.prev_sample, out.state
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_consistency_models_matches_reference():
    import torch

    from diffusers import CMStochasticIterativeScheduler as TorchCM

    from diffusers_tpu.schedulers import CMStochasticIterativeScheduler

    cfg = dict(num_train_timesteps=40, sigma_min=0.002, sigma_max=80.0, sigma_data=0.5)
    num_steps = 8

    sch_t = TorchCM(**cfg)
    sch_t.set_timesteps(num_steps)
    sample_t = torch.from_numpy(dummy_sample_deter()) * sch_t.init_noise_sigma
    for t in sch_t.timesteps:
        inp = sch_t.scale_model_input(sample_t, t)
        residual = inp * 0.1
        sample_t = sch_t.step(residual, t, sample_t, generator=torch.manual_seed(3)).prev_sample
    ref = sample_t.numpy()

    sch = CMStochasticIterativeScheduler(**cfg)
    state = sch.set_timesteps(num_steps)
    sample = jnp.asarray(dummy_sample_deter()) * state.init_noise_sigma
    for t in np.asarray(state.timesteps):
        inp = sch.scale_model_input(state, sample, t)
        residual = inp * 0.1
        noise = jnp.asarray(torch.randn(tuple(sample.shape), generator=torch.manual_seed(3)).numpy())
        out = sch.step(state, residual, t, sample, variance_noise=noise)
        sample, state = out.prev_sample, out.state
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_edm_dpmsolver_multistep_matches_reference():
    from diffusers import EDMDPMSolverMultistepScheduler as TorchEDMDPM

    from diffusers_tpu.schedulers import EDMDPMSolverMultistepScheduler

    cfg = dict(sigma_min=0.002, sigma_max=80.0, sigma_data=0.5)
    ref = run_reference(TorchEDMDPM, cfg, scale_input=True)
    ours = run_ours(EDMDPMSolverMultistepScheduler, cfg, scale_input=True)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_edm_dpmsolver_multistep_sigma_min_final():
    from diffusers import EDMDPMSolverMultistepScheduler as TorchEDMDPM

    from diffusers_tpu.schedulers import EDMDPMSolverMultistepScheduler

    cfg = dict(sigma_min=0.002, sigma_max=80.0, sigma_data=0.5, final_sigmas_type="sigma_min",
               lower_order_final=False)
    ref = run_reference(TorchEDMDPM, cfg, num_steps=12, scale_input=True)
    ours = run_ours(EDMDPMSolverMultistepScheduler, cfg, num_steps=12, scale_input=True)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_repaint_matches_reference():
    """Full RePaint resampling loop (steps + undo jumps) vs the reference."""
    import torch

    from diffusers import RePaintScheduler as TorchRePaint

    from diffusers_tpu.schedulers import RePaintScheduler

    cfg = dict(beta_start=0.0001, beta_end=0.02, beta_schedule="linear", eta=0.0)
    num_steps, jump_length, jump_n = 25, 5, 2

    sch_t = TorchRePaint(**cfg)
    sch_t.set_timesteps(num_steps, jump_length, jump_n)
    sch = RePaintScheduler(**cfg)
    state = sch.set_timesteps(num_steps, jump_length, jump_n)
    assert np.array_equal(np.asarray(state.timesteps), sch_t.timesteps.numpy())

    sample_np = dummy_sample_deter()
    original = dummy_sample_deter() * 0.5
    mask_np = np.zeros_like(sample_np)
    mask_np[:, :, :4] = 1.0

    sample_t = torch.from_numpy(sample_np.copy())
    orig_t, mask_t = torch.from_numpy(original.copy()), torch.from_numpy(mask_np.copy())
    sample = jnp.asarray(sample_np)
    orig, mask = jnp.asarray(original), jnp.asarray(mask_np)

    ts = sch_t.timesteps.numpy()
    seed = 0
    n_sub = 1000 // num_steps
    for i, t in enumerate(ts):
        t_prev = ts[i - 1] if i > 0 else t + 1
        if t < t_prev:  # reverse (denoise) step
            residual_t = sample_t * float(t) / (float(t) + 1)
            residual = sample * float(t) / (float(t) + 1)
            noise = torch.randn(tuple(sample_np.shape), generator=torch.manual_seed(seed))
            sample_t = sch_t.step(residual_t, int(t), sample_t, orig_t, mask_t,
                                  generator=torch.manual_seed(seed)).prev_sample
            sample = sch.step(state, residual, int(t), sample, orig, mask,
                              variance_noise=jnp.asarray(noise.numpy())).prev_sample
        else:  # forward jump
            g = torch.manual_seed(seed)
            noises = torch.stack([torch.randn(tuple(sample_np.shape), generator=g) for _ in range(n_sub)])
            sample_t = sch_t.undo_step(sample_t, int(t_prev), generator=torch.manual_seed(seed))
            sample = sch.undo_step(state, sample, int(t_prev), noises=jnp.asarray(noises.numpy()))
        seed += 1

    assert np.max(np.abs(np.asarray(sample) - sample_t.numpy())) < 1e-3


def test_unclip_matches_reference():
    """UnCLIP loop with explicit prev_timestep (karlo prior convention)."""
    import torch

    from diffusers import UnCLIPScheduler as TorchUnCLIP

    from diffusers_tpu.schedulers import UnCLIPScheduler

    for variance_type in ("fixed_small_log", "learned_range"):
        num_steps = 10
        sch_t = TorchUnCLIP(variance_type=variance_type)
        sch_t.set_timesteps(num_steps)
        sch = UnCLIPScheduler(variance_type=variance_type)
        state = sch.set_timesteps(num_steps)
        assert np.array_equal(np.asarray(state.timesteps), sch_t.timesteps.numpy())

        sample_t = torch.from_numpy(dummy_sample_deter())
        sample = jnp.asarray(dummy_sample_deter())
        ts = sch_t.timesteps.numpy()
        for i, t in enumerate(ts):
            prev_t = int(ts[i + 1]) if i + 1 < len(ts) else None
            residual_t = sample_t * float(t) / (float(t) + 1)
            if variance_type == "learned_range":  # model predicts variance too
                residual_t = torch.cat([residual_t, 0.1 * torch.ones_like(residual_t)], dim=1)
            noise = torch.randn(tuple(sample_t.shape), generator=torch.manual_seed(i))
            sample_t = sch_t.step(residual_t, int(t), sample_t, prev_timestep=prev_t,
                                  generator=torch.manual_seed(i)).prev_sample

            residual = sample * float(t) / (float(t) + 1)
            if variance_type == "learned_range":
                residual = jnp.concatenate([residual, 0.1 * jnp.ones_like(residual)], axis=1)
            sample = sch.step(state, residual, int(t), sample, prev_timestep=prev_t,
                              variance_noise=jnp.asarray(noise.numpy())).prev_sample
        err = np.max(np.abs(np.asarray(sample) - sample_t.numpy()))
        assert err < 1e-3, (variance_type, err)


def test_sasolver_matches_reference():
    """SA-Solver predictor-corrector loop with matched noise draws."""
    import torch

    from diffusers import SASolverScheduler as TorchSA

    from diffusers_tpu.schedulers import SASolverScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")
    num_steps = 10

    sch_t = TorchSA(**cfg)
    sch_t.set_timesteps(num_steps)
    sample_t = torch.from_numpy(dummy_sample_deter())
    for i, t in enumerate(sch_t.timesteps):
        residual = sample_t * float(t) / (float(t) + 1)
        sample_t = sch_t.step(residual, t, sample_t, generator=torch.manual_seed(i)).prev_sample
    ref = sample_t.numpy()

    sch = SASolverScheduler(**cfg)
    state = sch.set_timesteps(num_steps)
    assert np.array_equal(np.asarray(state.timesteps), sch_t.timesteps.numpy())
    sample = jnp.asarray(dummy_sample_deter())
    for i, t in enumerate(np.asarray(state.timesteps)):
        residual = sample * float(t) / (float(t) + 1)
        noise = torch.randn(tuple(sample.shape), generator=torch.manual_seed(i))
        out = sch.step(state, residual, t, sample, variance_noise=jnp.asarray(noise.numpy()))
        sample, state = out.prev_sample, out.state
    ours = np.asarray(sample)
    assert np.max(np.abs(ref - ours)) < 1e-3, np.max(np.abs(ref - ours))


def test_parallel_schedulers_match_reference():
    """ParaDiGMS batch_step_no_noise vs reference on a window of timesteps."""
    import torch

    from diffusers import DDIMParallelScheduler as TorchDDIMP, DDPMParallelScheduler as TorchDDPMP

    from diffusers_tpu.schedulers import DDIMParallelScheduler, DDPMParallelScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear", clip_sample=False)
    num_steps = 10
    rng = np.random.RandomState(0)
    window = 4
    sample = rng.randn(window, 3, 8, 8).astype(np.float32)
    model_out = rng.randn(window, 3, 8, 8).astype(np.float32)

    for TorchCls, OurCls in ((TorchDDPMP, DDPMParallelScheduler), (TorchDDIMP, DDIMParallelScheduler)):
        sch_t = TorchCls(**cfg)
        sch_t.set_timesteps(num_steps)
        ts = sch_t.timesteps[:window].clone()
        ref = sch_t.batch_step_no_noise(torch.from_numpy(model_out), ts, torch.from_numpy(sample)).numpy()

        sch = OurCls(**cfg)
        state = sch.set_timesteps(num_steps)
        ours = np.asarray(
            sch.batch_step_no_noise(state, jnp.asarray(model_out), jnp.asarray(np.asarray(ts)), jnp.asarray(sample))
        )
        assert np.max(np.abs(ref - ours)) < 1e-4, (TorchCls.__name__, np.max(np.abs(ref - ours)))

    # sequential step inherited unchanged
    from diffusers import DDIMScheduler as TorchDDIM

    sch_t = TorchDDIM(**cfg)
    sch_t.set_timesteps(num_steps)
    sch = DDIMParallelScheduler(**cfg)
    state = sch.set_timesteps(num_steps)
    t = int(np.asarray(state.timesteps)[0])
    ref = sch_t.step(torch.from_numpy(model_out[:1]), t, torch.from_numpy(sample[:1])).prev_sample.numpy()
    ours = np.asarray(sch.step(state, jnp.asarray(model_out[:1]), t, jnp.asarray(sample[:1])).prev_sample)
    assert np.max(np.abs(ref - ours)) < 1e-4


def test_dpm_multistep_order3_matches_reference():
    from diffusers import DPMSolverMultistepScheduler as TorchDPM

    from diffusers_tpu.schedulers import DPMSolverMultistepScheduler

    for algo in ("dpmsolver++", "dpmsolver"):
        cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
                   solver_order=3, algorithm_type=algo,
                   final_sigmas_type="sigma_min" if algo == "dpmsolver" else "zero")
        ref = run_reference(TorchDPM, cfg, num_steps=20)
        ours = run_ours(DPMSolverMultistepScheduler, cfg, num_steps=20)
        assert np.max(np.abs(ref - ours)) < 1e-4, (algo, np.max(np.abs(ref - ours)))


def test_dpm_multistep_order3_lower_order_final_small_steps():
    from diffusers import DPMSolverMultistepScheduler as TorchDPM

    from diffusers_tpu.schedulers import DPMSolverMultistepScheduler

    # < 15 steps exercises lower_order_final + lower_order_second demotions
    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear", solver_order=3)
    ref = run_reference(TorchDPM, cfg, num_steps=8)
    ours = run_ours(DPMSolverMultistepScheduler, cfg, num_steps=8)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_unipc_order3_matches_reference():
    from diffusers import UniPCMultistepScheduler as TorchUniPC

    from diffusers_tpu.schedulers import UniPCMultistepScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear", solver_order=3)
    ref = run_reference(TorchUniPC, cfg, num_steps=20)
    ours = run_ours(UniPCMultistepScheduler, cfg, num_steps=20)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_unipc_order3_small_steps_lower_order_final():
    from diffusers import UniPCMultistepScheduler as TorchUniPC

    from diffusers_tpu.schedulers import UniPCMultistepScheduler

    cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear", solver_order=3)
    ref = run_reference(TorchUniPC, cfg, num_steps=6)
    ours = run_ours(UniPCMultistepScheduler, cfg, num_steps=6)
    assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))


def test_flow_match_heun_matches_reference():
    import torch
    from diffusers import FlowMatchHeunDiscreteScheduler as TorchFMH

    from diffusers_tpu.schedulers import FlowMatchHeunDiscreteScheduler

    for shift in (1.0, 3.0):
        cfg = dict(num_train_timesteps=1000, shift=shift)
        # torch FlowMatchHeun has no scale_model_input — plain loop
        tsch = TorchFMH(**cfg)
        tsch.set_timesteps(8)
        sample = torch.from_numpy(dummy_sample_deter())
        for t in tsch.timesteps:
            residual = sample * t / (t + 1)
            sample = tsch.step(residual, t, sample).prev_sample
        ref = sample.numpy()

        sch = FlowMatchHeunDiscreteScheduler(**cfg)
        state = sch.set_timesteps(8)
        s = jnp.asarray(dummy_sample_deter())
        for t in np.asarray(state.timesteps):
            residual = s * t / (t + 1)
            out = sch.step(state, residual, t, s)
            s, state = out.prev_sample, out.state
        ours = np.asarray(s)
        assert np.max(np.abs(ref - ours)) < 1e-3, (shift, np.max(np.abs(ref - ours)))


def test_scm_matches_reference_single_step_and_trig_identity():
    import jax
    import torch
    from diffusers import SCMScheduler as TorchSCM

    from diffusers_tpu.schedulers import SCMScheduler

    # 1-step is deterministic (t=0 ⇒ no re-noise): exact parity
    sample = dummy_sample_deter()
    tsch = TorchSCM()
    tsch.set_timesteps(1, intermediate_timesteps=None)
    t0 = tsch.timesteps[0]
    residual = torch.from_numpy(sample) * 0.1
    ref = tsch.step(residual, t0, torch.from_numpy(sample)).prev_sample.numpy()

    ours_sch = SCMScheduler()
    state = ours_sch.set_timesteps(1)
    out = ours_sch.step(state, jnp.asarray(sample) * 0.1, state.timesteps[0], jnp.asarray(sample))
    assert np.max(np.abs(np.asarray(out.prev_sample) - ref)) < 1e-5

    # multi-step: verify the trigflow identity against a manual computation
    state = ours_sch.set_timesteps(2)  # [max, 1.3, 0]
    key = jax.random.PRNGKey(0)
    out = ours_sch.step(state, jnp.asarray(sample) * 0.1, state.timesteps[0], jnp.asarray(sample), key=key)
    s, t = np.asarray(state.timesteps[:2])
    x0 = np.cos(s) * sample - np.sin(s) * sample * 0.1
    from diffusers_tpu.utils.jax_utils import randn_tensor

    noise = np.asarray(randn_tensor(sample.shape, key=key)) * 0.5
    manual = np.cos(t) * x0 + np.sin(t) * noise
    assert np.max(np.abs(np.asarray(out.prev_sample) - manual)) < 1e-5


def test_dpmsolver_sde_matches_numpy_oracle():
    """torchsde is unavailable (the reference class can't instantiate), so the
    oracle is a direct numpy transcription of the reference step math
    (scheduling_dpmsolver_sde.py:700-760) with injected noise."""
    from diffusers_tpu.schedulers import DPMSolverSDEScheduler

    for karras in (False, True):
        cfg = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
                   use_karras_sigmas=karras)
        sch = DPMSolverSDEScheduler(**cfg)
        state = sch.set_timesteps(8)
        sigmas = np.asarray(state.sigmas, dtype=np.float64)
        timesteps = np.asarray(state.timesteps)
        rng = np.random.RandomState(0)
        fixed = [rng.randn(*dummy_sample_deter().shape).astype(np.float32) for _ in range(len(timesteps))]

        # ---- numpy oracle (reference math, verbatim formulas) ----
        x = dummy_sample_deter().astype(np.float64) * float(state.init_noise_sigma)
        buffered = None
        for i, t in enumerate(timesteps):
            inp = x / (sigmas[i] ** 2 + 1) ** 0.5
            residual = (inp * t / (t + 1)).astype(np.float64)
            first = i % 2 == 0
            sigma = sigmas[i] if first else sigmas[i - 1]
            sigma_next = sigmas[i + 1] if first else sigmas[i]
            tt, t_next_full = -np.log(sigma), -np.log(max(sigma_next, 1e-20))
            t_prop = tt + (t_next_full - tt) * 0.5
            sigma_input = sigma if first else np.exp(-t_prop)
            pred_x0 = x - sigma_input * residual
            if sigma_next == 0:
                d = (x - pred_x0) / sigma
                x = x + d * (sigma_next - sigma)
            else:
                t_next = t_prop if first else t_next_full
                base = x if first else buffered
                s_from, s_to = np.exp(-tt), np.exp(-t_next)
                s_up = min(s_to, (s_to**2 * (s_from**2 - s_to**2) / s_from**2) ** 0.5)
                s_down = (s_to**2 - s_up**2) ** 0.5
                anc_t = -np.log(max(s_down, 1e-20))
                x_new = (np.exp(-anc_t) / np.exp(-tt)) * base - np.expm1(tt - anc_t) * pred_x0
                x_new = x_new + fixed[i].astype(np.float64) * s_up
                if first:
                    buffered = x
                x = x_new
        ref = x

        # ---- ours ----
        state = sch.set_timesteps(8)
        s_j = jnp.asarray(dummy_sample_deter()) * state.init_noise_sigma
        for i, t in enumerate(np.asarray(state.timesteps)):
            inp = sch.scale_model_input(state, s_j, t)
            residual = inp * t / (t + 1)
            out = sch.step(state, residual, t, s_j, variance_noise=jnp.asarray(fixed[i]))
            s_j, state = out.prev_sample, out.state
        ours = np.asarray(s_j, dtype=np.float64)
        err = np.max(np.abs(ref - ours)) / max(np.abs(ref).max(), 1e-6)
        assert err < 1e-3, (karras, err)


def test_cogvideox_ddim_matches_reference():
    from diffusers import CogVideoXDDIMScheduler as TorchCog

    from diffusers_tpu.schedulers import CogVideoXDDIMScheduler

    for cfg in (
        dict(prediction_type="v_prediction", rescale_betas_zero_snr=True, timestep_spacing="trailing",
             snr_shift_scale=1.0),
        dict(prediction_type="epsilon", snr_shift_scale=3.0),
    ):
        ref = run_reference(TorchCog, cfg)
        ours = run_ours(CogVideoXDDIMScheduler, cfg)
        assert np.max(np.abs(ref - ours)) < 1e-4, np.max(np.abs(ref - ours))
