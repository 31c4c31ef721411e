"""Shap-E NeRF/STF renderer.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/shap_e/renderer.py:783` ShapERenderer):
latent -> per-asset MLP weights via ChannelsProj (`:707`), NeRF volume
rendering with stratified + importance ray sampling (`:352,:404`), void
background compositing (`:213`), and STF mesh extraction via a
checkpoint-provided marching-cubes LUT (`:484`).

TPU-first: the functional parameter tree makes the reference's
`state_dict().copy_` weight-grafting a plain dict override (`_graft_mlp`);
ray rendering over a view batch is one jitted call; marching cubes — a
one-off, dynamic-shape op — runs host-side in numpy. Random ray jitter takes
an explicit jax key; with `key=None` samplers use deterministic midpoints
(the reference hard-seeds `torch.manual_seed(0)` at `:397`, so its jitter is
equally non-random).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from .camera import create_pan_cameras


def posenc_nerf(x: jax.Array, min_deg: int = 0, max_deg: int = 15) -> jax.Array:
    if min_deg == max_deg:
        return x
    scales = 2.0 ** jnp.arange(min_deg, max_deg, dtype=x.dtype)
    *shape, dim = x.shape
    xb = (x.reshape(-1, 1, dim) * scales.reshape(1, -1, 1)).reshape(*shape, -1)
    emb = jnp.sin(jnp.concatenate([xb, xb + math.pi / 2.0], axis=-1))
    return jnp.concatenate([x, emb], axis=-1)


def encode_position(position):
    return posenc_nerf(position, min_deg=0, max_deg=15)


def encode_direction(position, direction=None):
    if direction is None:
        return jnp.zeros_like(posenc_nerf(position, min_deg=0, max_deg=8))
    return posenc_nerf(direction, min_deg=0, max_deg=8)


def _sanitize_name(x: str) -> str:
    return x.replace(".", "__")


@dataclass
class VolumeRange:
    t0: jax.Array
    t1: jax.Array
    intersected: jax.Array

    def partition(self, ts):
        mids = (ts[..., 1:, :] + ts[..., :-1, :]) * 0.5
        lower = jnp.concatenate([self.t0[..., None, :], mids], axis=-2)
        upper = jnp.concatenate([mids, self.t1[..., None, :]], axis=-2)
        return lower, upper, upper - lower


class BoundingBoxVolume:
    def __init__(self, *, bbox_min, bbox_max, min_dist: float = 0.0, min_t_range: float = 1e-3):
        self.min_dist = min_dist
        self.min_t_range = min_t_range
        self.bbox_min = np.asarray(bbox_min, dtype=np.float32)
        self.bbox_max = np.asarray(bbox_max, dtype=np.float32)

    def intersect(self, origin: jax.Array, direction: jax.Array, epsilon=1e-6) -> VolumeRange:
        bbox = jnp.stack([jnp.asarray(self.bbox_min), jnp.asarray(self.bbox_max)])
        ones = (1,) * (origin.ndim - 1)
        bbox = bbox.reshape(*ones, 2, 3)

        denom = direction[..., None, :]
        denom = jnp.where(denom < 0, denom - epsilon, denom + epsilon)
        ts = (bbox - origin[..., None, :]) / denom
        t0 = jnp.clip(jnp.max(jnp.min(ts, axis=-2), axis=-1, keepdims=True), self.min_dist)
        t1 = jnp.min(jnp.max(ts, axis=-2), axis=-1, keepdims=True)
        intersected = t0 + self.min_t_range < t1
        t0 = jnp.where(intersected, t0, jnp.zeros_like(t0))
        t1 = jnp.where(intersected, t1, jnp.ones_like(t1))
        return VolumeRange(t0=t0, t1=t1, intersected=intersected)


class StratifiedRaySampler:
    def __init__(self, depth_mode: str = "linear"):
        assert depth_mode in ("linear", "geometric", "harmonic")
        self.depth_mode = depth_mode

    def sample(self, t0, t1, n_samples: int, key: Optional[jax.Array] = None, epsilon=1e-3):
        ones = (1,) * (t0.ndim - 1)
        ts = jnp.linspace(0.0, 1.0, n_samples, dtype=t0.dtype).reshape(*ones, n_samples)
        if self.depth_mode == "linear":
            ts = t0 * (1.0 - ts) + t1 * ts
        elif self.depth_mode == "geometric":
            ts = jnp.exp(jnp.log(jnp.clip(t0, epsilon)) * (1.0 - ts) + jnp.log(jnp.clip(t1, epsilon)) * ts)
        else:
            ts = 1.0 / (1.0 / jnp.clip(t0, epsilon) * (1.0 - ts) + 1.0 / jnp.clip(t1, epsilon) * ts)
        mids = 0.5 * (ts[..., 1:] + ts[..., :-1])
        upper = jnp.concatenate([mids, t1], axis=-1)
        lower = jnp.concatenate([t0, mids], axis=-1)
        t_rand = jax.random.uniform(key, ts.shape, ts.dtype) if key is not None else 0.5
        return (lower + (upper - lower) * t_rand)[..., None]


class ImportanceRaySampler:
    def __init__(self, volume_range: VolumeRange, ts, weights, blur_pool: bool = False, alpha: float = 1e-5):
        self.volume_range = volume_range
        self.ts = ts
        self.weights = weights
        self.blur_pool = blur_pool
        self.alpha = alpha

    def sample(self, t0, t1, n_samples: int, key: Optional[jax.Array] = None):
        lower, upper, _ = self.volume_range.partition(self.ts)
        *shape, n_coarse, _ = self.ts.shape

        weights = self.weights
        if self.blur_pool:
            padded = jnp.concatenate([weights[..., :1, :], weights, weights[..., -1:, :]], axis=-2)
            maxes = jnp.maximum(padded[..., :-1, :], padded[..., 1:, :])
            weights = 0.5 * (maxes[..., :-1, :] + maxes[..., 1:, :])
        weights = weights + self.alpha
        pmf = weights / weights.sum(axis=-2, keepdims=True)

        cdf = jnp.cumsum(pmf.reshape(-1, n_coarse), axis=1)
        if key is not None:
            k1, k2 = jax.random.split(key)
            u = jax.random.uniform(k1, (cdf.shape[0], n_samples))
        else:
            k2 = None
            u = jnp.full((cdf.shape[0], n_samples), 0.5)
        inds = jax.vmap(jnp.searchsorted)(cdf, u)
        inds = jnp.clip(inds, 0, n_coarse - 1).reshape(*shape, n_samples, 1)

        t_rand = jax.random.uniform(k2, inds.shape) if k2 is not None else 0.5
        lower_ = jnp.take_along_axis(lower, inds, axis=-2)
        upper_ = jnp.take_along_axis(upper, inds, axis=-2)
        ts = lower_ + (upper_ - lower_) * t_rand
        return jnp.sort(ts, axis=-2)


def integrate_samples(volume_range: VolumeRange, ts, density, channels):
    _, _, dt = volume_range.partition(ts)
    ddensity = density * dt
    mass = jnp.cumsum(ddensity, axis=-2)
    transmittance = jnp.exp(-mass[..., -1, :])
    alphas = 1.0 - jnp.exp(-ddensity)
    Ts = jnp.exp(jnp.concatenate([jnp.zeros_like(mass[..., :1, :]), -mass[..., :-1, :]], axis=-2))
    weights = alphas * Ts
    return jnp.sum(channels * weights, axis=-2), weights, transmittance


def volume_query_points(volume: BoundingBoxVolume, grid_size: int) -> np.ndarray:
    indices = np.arange(grid_size**3)
    zs = indices % grid_size
    ys = (indices // grid_size) % grid_size
    xs = (indices // grid_size**2) % grid_size
    combined = np.stack([xs, ys, zs], axis=1).astype(np.float32)
    return (combined / (grid_size - 1)) * (volume.bbox_max - volume.bbox_min) + volume.bbox_min


def _convert_srgb_to_linear(u: np.ndarray) -> np.ndarray:
    return np.where(u <= 0.04045, u / 12.92, ((u + 0.055) / 1.055) ** 2.4)


class MLPNeRSTFModel(Module):
    """Reference `renderer.py:608`. Swish MLP over NeRF positional encodings
    with direction features spliced in at layer `insert_direction_at`; the 12
    output channels pack sdf/density/stf/nerf heads (`:647`)."""

    def __init__(self, d_hidden=256, n_output=12, n_hidden_layers=6, act_fn="swish", insert_direction_at=4):
        super().__init__()
        if act_fn != "swish":
            raise ValueError(f"Unsupported activation function {act_fn}")
        self.insert_direction_at = insert_direction_at
        d_posenc_pos = 3 + 3 * 2 * 15
        d_posenc_dir = 3 + 3 * 2 * 8
        mlp_widths = [d_hidden] * n_hidden_layers
        input_widths = [d_posenc_pos] + mlp_widths
        output_widths = mlp_widths + [n_output]
        if insert_direction_at is not None:
            input_widths[insert_direction_at] += d_posenc_dir
        self.mlp = ModuleList([Linear(d_in, d_out) for d_in, d_out in zip(input_widths, output_widths)])

    def __call__(self, params: Params, position, direction=None, ts=None,
                 nerf_level: str = "coarse", rendering_mode: str = "nerf"):
        h = encode_position(position)
        h_preact = h
        for i, layer in enumerate(self.mlp):
            if i == self.insert_direction_at:
                h = jnp.concatenate([h, encode_direction(position, direction=direction)], axis=-1)
            h = layer(params["mlp"][i], h)
            h_preact = h
            if i < len(self.mlp) - 1:
                h = jax.nn.silu(h)
        out = h_preact
        sdf = out[..., 0:1]
        density = out[..., 1:2] if nerf_level == "coarse" else out[..., 2:3]
        if rendering_mode == "nerf":
            channels = out[..., 6:9] if nerf_level == "coarse" else out[..., 9:12]
        else:  # stf
            channels = out[..., 3:6]
        return dict(
            density=jax.nn.relu(density),
            signed_distance=jnp.tanh(sdf),
            channels=jax.nn.sigmoid(channels),
            ts=ts,
        )


class ChannelsProj(Module):
    def __init__(self, *, vectors: int, channels: int, d_latent: int):
        super().__init__()
        self.proj = Linear(d_latent, vectors * channels)
        self.norm = LayerNorm(channels)
        self.vectors = vectors
        self.channels = channels

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        kernel = params["proj"]["kernel"].reshape(-1, self.vectors, self.channels)
        bias = params["proj"]["bias"].reshape(1, self.vectors, self.channels)
        h = jnp.einsum("bvd,dvc->bvc", x, kernel)
        h = self.norm(params["norm"], h)
        return h + bias


class ShapEParamsProjModel(Module):
    """Latent -> per-asset MLP weights (reference `:733`)."""

    def __init__(self, *, param_names, param_shapes, d_latent=1024):
        super().__init__()
        self.param_names = tuple(param_names)
        self.param_shapes = tuple(tuple(s) for s in param_shapes)
        projections = _ProjDict()
        for k, (vectors, channels) in zip(self.param_names, self.param_shapes):
            projections._children[_sanitize_name(k)] = ChannelsProj(
                vectors=vectors, channels=channels, d_latent=d_latent)
        self.projections = projections

    def __call__(self, params: Params, x: jax.Array) -> Dict[str, jax.Array]:
        out = {}
        start = 0
        for k, shape in zip(self.param_names, self.param_shapes):
            vectors, _ = shape
            end = start + vectors
            proj = self.projections._children[_sanitize_name(k)]
            out[k] = proj(params["projections"][_sanitize_name(k)], x[:, start:end]).reshape(len(x), *shape)
            start = end
        return out


class _ProjDict(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        out = {}
        for i, (name, child) in enumerate(self._children.items()):
            out[name] = child.init(jax.random.fold_in(key, i), dtype=dtype)
        return out


class _Buffer(Module):
    """Parameter-holding leaf for checkpoint buffers (background, LUTs)."""

    def __init__(self, **arrays):
        super().__init__()
        self.arrays = arrays

    def init(self, key, dtype=jnp.float32) -> Params:
        return {k: jnp.asarray(v) for k, v in self.arrays.items()}


class ShapERenderer(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        *,
        param_names: Tuple[str, ...] = (
            "nerstf.mlp.0.weight", "nerstf.mlp.1.weight", "nerstf.mlp.2.weight", "nerstf.mlp.3.weight",
        ),
        param_shapes: Tuple[Tuple[int, int], ...] = ((256, 93), (256, 256), (256, 256), (256, 256)),
        d_latent: int = 1024,
        d_hidden: int = 256,
        n_output: int = 12,
        n_hidden_layers: int = 6,
        act_fn: str = "swish",
        insert_direction_at: int = 4,
        background: Tuple[float, ...] = (255.0, 255.0, 255.0),
    ):
        super().__init__()
        self.params_proj = ShapEParamsProjModel(
            param_names=param_names, param_shapes=param_shapes, d_latent=d_latent)
        self.mlp = MLPNeRSTFModel(d_hidden, n_output, n_hidden_layers, act_fn, insert_direction_at)
        self.void = _Buffer(background=np.asarray(background, dtype=np.float32) / 255.0)
        self.mesh_decoder = _Buffer(
            cases=np.zeros((256, 5, 3), dtype=np.int64), masks=np.zeros((256, 5), dtype=bool))
        self.volume = BoundingBoxVolume(bbox_max=[1.0, 1.0, 1.0], bbox_min=[-1.0, -1.0, -1.0])

    # -- weight grafting ----------------------------------------------------
    def _graft_mlp(self, params: Params, latent: jax.Array) -> Params:
        """Project the latent and override the MLP weight leaves — the
        functional analogue of the reference's state_dict copy (`:917-919`)."""
        projected = self.params_proj(params["params_proj"], latent)
        mlp_params = dict(params["mlp"])
        mlp_tree = {int(k): dict(v) for k, v in mlp_params["mlp"].items()}
        for name, value in projected.items():
            assert name.startswith("nerstf.mlp.") and name.endswith(".weight")
            idx = int(name.split(".")[2])
            # torch [out, in] -> our [in, out]
            mlp_tree[idx]["kernel"] = value[0].T
        mlp_params["mlp"] = mlp_tree
        return mlp_params

    # -- volume rendering ----------------------------------------------------
    def render_rays(self, mlp_params, background, rays, sampler, n_samples: int,
                    prev_model_out=None, render_with_direction: bool = False,
                    key: Optional[jax.Array] = None):
        origin, direction = rays[..., 0, :], rays[..., 1, :]
        vrange = self.volume.intersect(origin, direction)
        ts = sampler.sample(vrange.t0, vrange.t1, n_samples, key=key)

        if prev_model_out is not None:
            ts = jnp.sort(jnp.concatenate([ts, prev_model_out["ts"]], axis=-2), axis=-2)

        batch_size, *ts_shape, _ = ts.shape
        directions = jnp.broadcast_to(direction[..., None, :], (batch_size, *ts_shape, 3))
        positions = origin[..., None, :] + ts * directions
        optional_directions = directions if render_with_direction else None

        model_out = self.mlp(
            mlp_params, position=positions, direction=optional_directions, ts=ts,
            nerf_level="coarse" if prev_model_out is None else "fine",
        )
        channels, weights, transmittance = integrate_samples(
            vrange, model_out["ts"], model_out["density"], model_out["channels"])

        transmittance = jnp.where(vrange.intersected, transmittance, jnp.ones_like(transmittance))
        channels = jnp.where(vrange.intersected, channels, jnp.zeros_like(channels))
        channels = channels + transmittance * background

        weighted_sampler = ImportanceRaySampler(vrange, ts=model_out["ts"], weights=weights)
        return channels, weighted_sampler, model_out

    def decode_to_image(self, params: Params, latents: jax.Array, size: int = 64,
                        ray_batch_size: int = 4096, n_coarse_samples: int = 64,
                        n_fine_samples: int = 128, key: Optional[jax.Array] = None):
        mlp_params = self._graft_mlp(params, latents)
        background = params["void"]["background"]

        camera = create_pan_cameras(size)
        rays = jnp.asarray(camera.camera_rays)
        coarse_sampler = StratifiedRaySampler()

        images = []
        total = rays.shape[1]
        for idx in range(0, total, ray_batch_size):
            rays_batch = rays[:, idx: idx + ray_batch_size]
            k1 = k2 = None
            if key is not None:
                key, k1, k2 = jax.random.split(key, 3)
            _, fine_sampler, coarse_out = self.render_rays(
                mlp_params, background, rays_batch, coarse_sampler, n_coarse_samples, key=k1)
            channels, _, _ = self.render_rays(
                mlp_params, background, rays_batch, fine_sampler, n_fine_samples,
                prev_model_out=coarse_out, key=k2)
            images.append(channels)

        images = jnp.concatenate(images, axis=1)
        return images.reshape(*camera.shape, camera.height, camera.width, -1)[0]

    def decode_to_mesh(self, params: Params, latents: jax.Array, grid_size: int = 128,
                       query_batch_size: int = 4096, texture_channels=("R", "G", "B")):
        mlp_params = self._graft_mlp(params, latents)

        query_points = volume_query_points(self.volume, grid_size)
        fields = []
        for idx in range(0, len(query_points), query_batch_size):
            out = self.mlp(mlp_params, position=jnp.asarray(query_points[None, idx: idx + query_batch_size]),
                           nerf_level="fine", rendering_mode="stf")
            fields.append(np.asarray(out["signed_distance"]))
        fields = np.concatenate(fields, axis=1).reshape(grid_size, grid_size, grid_size)

        full_grid = np.full((grid_size + 2,) * 3, -1.0, dtype=np.float32)
        full_grid[1:-1, 1:-1, 1:-1] = fields

        verts, faces = _marching_cubes(
            full_grid,
            np.asarray(params["mesh_decoder"]["cases"]),
            np.asarray(params["mesh_decoder"]["masks"]),
            self.volume.bbox_min, self.volume.bbox_max - self.volume.bbox_min,
        )

        if len(verts) == 0:  # untrained/degenerate LUT — empty mesh
            return MeshDecoderOutput(
                verts=verts, faces=faces,
                vertex_channels={ch: np.zeros((0,), np.float32) for ch in texture_channels})

        textures = []
        for idx in range(0, len(verts), query_batch_size):
            out = self.mlp(mlp_params, position=jnp.asarray(verts[None, idx: idx + query_batch_size]),
                           nerf_level="fine", rendering_mode="stf")
            textures.append(np.asarray(out["channels"]))
        textures = _convert_srgb_to_linear(np.concatenate(textures, axis=1)[0])

        return MeshDecoderOutput(
            verts=verts, faces=faces,
            vertex_channels=dict(zip(texture_channels, textures.T)),
        )


@dataclass
class MeshDecoderOutput(BaseOutput):
    verts: np.ndarray
    faces: np.ndarray
    vertex_channels: Optional[Dict[str, np.ndarray]] = None


def _create_flat_edge_indices(flat_cube_indices: np.ndarray, grid_size) -> np.ndarray:
    """Reference `:131` — 12 global edge ids per cube (x-, y-, z-spanning)."""
    gx, gy, gz = grid_size
    num_xs = (gx - 1) * gy * gz
    y_offset = num_xs
    z_offset = num_xs + gx * (gy - 1) * gz
    i, j, k = flat_cube_indices[:, 0], flat_cube_indices[:, 1], flat_cube_indices[:, 2]
    return np.stack(
        [
            i * gy * gz + j * gz + k,
            i * gy * gz + (j + 1) * gz + k,
            i * gy * gz + j * gz + k + 1,
            i * gy * gz + (j + 1) * gz + k + 1,
            y_offset + i * (gy - 1) * gz + j * gz + k,
            y_offset + (i + 1) * (gy - 1) * gz + j * gz + k,
            y_offset + i * (gy - 1) * gz + j * gz + k + 1,
            y_offset + (i + 1) * (gy - 1) * gz + j * gz + k + 1,
            z_offset + i * gy * (gz - 1) + j * (gz - 1) + k,
            z_offset + (i + 1) * gy * (gz - 1) + j * (gz - 1) + k,
            z_offset + i * gy * (gz - 1) + (j + 1) * (gz - 1) + k,
            z_offset + (i + 1) * gy * (gz - 1) + (j + 1) * (gz - 1) + k,
        ],
        axis=-1,
    )


def _marching_cubes(field: np.ndarray, cases: np.ndarray, masks: np.ndarray,
                    min_point: np.ndarray, size: np.ndarray):
    """Marching cubes with the checkpoint's LUT (reference MeshDecoder `:497`).
    Host-side numpy — output sizes are data-dependent."""
    grid_size = field.shape
    gst = np.asarray(grid_size, dtype=np.float32)

    bitmasks = (field > 0).astype(np.uint8)
    bitmasks = bitmasks[:-1] | (bitmasks[1:] << 1)
    bitmasks = bitmasks[:, :-1] | (bitmasks[:, 1:] << 2)
    bitmasks = bitmasks[:, :, :-1] | (bitmasks[:, :, 1:] << 4)

    cc = np.stack(np.meshgrid(*[np.arange(s, dtype=field.dtype) for s in grid_size], indexing="ij"), axis=-1)
    edge_midpoints = np.concatenate(
        [
            ((cc[:-1] + cc[1:]) / 2).reshape(-1, 3),
            ((cc[:, :-1] + cc[:, 1:]) / 2).reshape(-1, 3),
            ((cc[:, :, :-1] + cc[:, :, 1:]) / 2).reshape(-1, 3),
        ],
        axis=0,
    )

    ci = np.stack(np.meshgrid(*[np.arange(s - 1) for s in grid_size], indexing="ij"), axis=-1)
    flat_cube_indices = ci.reshape(-1, 3)
    edge_indices = _create_flat_edge_indices(flat_cube_indices, grid_size)

    flat_bitmasks = bitmasks.reshape(-1).astype(np.int64)
    local_tris = cases[flat_bitmasks]
    local_masks = masks[flat_bitmasks]
    global_tris = np.take_along_axis(
        edge_indices, local_tris.reshape(local_tris.shape[0], -1), axis=1
    ).reshape(local_tris.shape)
    selected_tris = global_tris.reshape(-1, 3)[local_masks.reshape(-1)]

    used_vertex_indices = np.unique(selected_tris.reshape(-1))
    used_edge_midpoints = edge_midpoints[used_vertex_indices]
    old_to_new = np.zeros(len(edge_midpoints), dtype=np.int64)
    old_to_new[used_vertex_indices] = np.arange(len(used_vertex_indices))
    faces = old_to_new[selected_tris.reshape(-1)].reshape(selected_tris.shape)

    v1 = np.floor(used_edge_midpoints).astype(np.int64)
    v2 = np.ceil(used_edge_midpoints).astype(np.int64)
    s1 = field[v1[:, 0], v1[:, 1], v1[:, 2]]
    s2 = field[v2[:, 0], v2[:, 1], v2[:, 2]]
    p1 = (v1.astype(np.float32) / (gst - 1)) * size + min_point
    p2 = (v2.astype(np.float32) / (gst - 1)) * size + min_point
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (s1 / (s1 - s2))[:, None]
    verts = t * p2 + (1 - t) * p1
    return verts.astype(np.float32), faces
