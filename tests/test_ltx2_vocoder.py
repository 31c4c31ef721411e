"""LTX2Vocoder / LTX2VocoderWithBWE parity vs torch reference (tiny configs)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.pipelines.ltx2.vocoder import LTX2Vocoder, LTX2VocoderWithBWE

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=8,  # C=2 x M=4 mel bins
    hidden_channels=16,
    out_channels=2,
    upsample_kernel_sizes=[4, 4],
    upsample_factors=[2, 2],
    resnet_kernel_sizes=[3, 7],
    resnet_dilations=[[1, 3], [1, 3]],
    act_fn="leaky_relu",
)


def _compare(config, cls_name="LTX2Vocoder", frames=6, seed=0, **call_kw):
    torch = pytest.importorskip("torch")
    import diffusers.pipelines.ltx2.vocoder as ref_voc

    tm = getattr(ref_voc, cls_name)(**config)
    tm.eval()
    # fill STFT/mel buffers (zero-initialized placeholders in the reference;
    # loaded from checkpoints in practice)
    rng = np.random.RandomState(seed + 100)
    sd0 = tm.state_dict()
    for k in list(sd0):
        if "basis" in k or "mel_basis" in k:
            sd0[k] = torch.from_numpy(rng.randn(*sd0[k].shape).astype(np.float32) * 0.05)
    tm.load_state_dict(sd0)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    ours = (LTX2Vocoder if cls_name == "LTX2Vocoder" else LTX2VocoderWithBWE)(**config)
    params = convert_torch_state_dict(ours, sd)

    rng = np.random.RandomState(seed)
    C = 2
    M = config["in_channels"] // C
    x = rng.randn(1, C, frames, M).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), **call_kw).numpy()
    got = np.asarray(ours(params, jnp.asarray(x), **call_kw))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = np.max(np.abs(got - ref))
    assert err < 5e-4, f"vocoder diverges: {err}"


def test_vocoder_parity_leaky_relu():
    _compare(TINY)


def test_vocoder_parity_time_last():
    _compare(TINY, frames=4, time_last=True)


def test_vocoder_parity_snakebeta_antialias():
    cfg = dict(TINY)
    cfg.update(act_fn="snakebeta", antialias=True, antialias_ratio=2,
               antialias_kernel_size=8, final_act_fn=None, final_bias=False)
    _compare(cfg)


def test_vocoder_bwe_parity():
    cfg = dict(
        in_channels=8,
        hidden_channels=16,
        out_channels=2,
        upsample_kernel_sizes=[4, 4],
        upsample_factors=[2, 2],
        resnet_kernel_sizes=[3],
        resnet_dilations=[[1, 3]],
        act_fn="snakebeta",
        antialias=True,
        antialias_kernel_size=8,
        final_act_fn=None,
        final_bias=False,
        bwe_in_channels=8,  # out_channels(2) x num_mel_channels(4)
        bwe_hidden_channels=16,
        bwe_out_channels=2,
        bwe_upsample_kernel_sizes=[4, 4],
        bwe_upsample_factors=[2, 2],
        bwe_resnet_kernel_sizes=[3],
        bwe_resnet_dilations=[[1, 3]],
        bwe_act_fn="snakebeta",
        bwe_antialias=True,
        bwe_antialias_kernel_size=8,
        bwe_final_act_fn=None,
        bwe_final_bias=False,
        filter_length=8,
        hop_length=2,
        window_length=8,
        num_mel_channels=4,
        input_sampling_rate=8000,
        output_sampling_rate=16000,
    )
    _compare(cfg, cls_name="LTX2VocoderWithBWE", frames=5)
