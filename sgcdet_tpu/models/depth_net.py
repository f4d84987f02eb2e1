"""Multi-view-stereo + monocular depth-distribution head.

Re-expression of the reference's ``DepthNet_Fusion``
(/root/reference/mmdet3d_plugin/models/im2voxel/depth_utils/
depth_est_fusion.py:166-330): per-view categorical depth distributions over D
bins from (a) a plane-sweep dot-product cost volume against the k temporally
adjacent views using a truncated ResNet-18 matching extractor, and (b) a
monocular branch from FPN features, fused by 2D U-Nets and a softmax.

TPU-first notes: the per-scene Python loop of the reference becomes a batched
formulation over all N views at once; plane-sweep warping is one batched
bilinear gather (D x H x W grid per view-neighbor pair) that XLA fuses; the
neighbor gather is a static index select (neighbor ids depend only on N).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Conv, ConvTranspose, grid_sample_2d
from .resnet import ResNetFPNMatching


def knn_indices(x, ref, k, maskself=False):
    """Top-k nearest refs per source point by squared distance.

    x: (B, C, num_src); ref: (B, C, num_ref) — matches the reference's knn
    (depth_est_fusion.py:11-32). Returns (B, num_src, k) int indices.
    """
    inner = -2 * jnp.einsum("bcs,bcr->bsr", x, ref)
    xx = jnp.sum(x**2, axis=1)[:, :, None]
    yy = jnp.sum(ref**2, axis=1)[:, None, :]
    dist = -yy - inner - xx  # negative squared distance
    if maskself:
        n = x.shape[2]
        eye = jnp.eye(n, dtype=bool)
        dist = jnp.where(eye[None], -100000.0, dist)
    return jax.lax.top_k(dist, k)[1]


def get_nearest_pose_ids(tar_pose, ref_poses, num_select, maskself=False):
    """Pose-distance neighbor selection (the reference's alternative to
    temporal adjacency, depth_est_fusion.py:35-50). Poses are c2w (N, 4, 4)."""
    num_cams = ref_poses.shape[0]
    num_select = min(num_select, num_cams - 1)
    tar = tar_pose[:, :3, 3].T[None]  # (1, 3, N)
    ref = ref_poses[:, :3, 3].T[None]
    return knn_indices(tar, ref, num_select, maskself=maskself)[0]


def get_closest_frame_ids(num_cams: int, num_select: int) -> np.ndarray:
    """Temporally-adjacent neighbor ids, matching depth_est_fusion.py:53-64
    (boundary rows are shifted inward by k/2+1)."""
    assert num_select % 2 == 0
    main = np.arange(num_cams)[:, None]
    offsets = np.concatenate(
        [np.arange(-num_select // 2, 0), np.arange(1, num_select // 2 + 1)]
    )[None]
    closest = main + offsets
    closest[0 : num_select // 2, :] += num_select // 2 + 1
    closest[num_cams - num_select // 2 : num_cams, :] -= num_select // 2 + 1
    return closest


def _warp_grid(src_proj, ref_proj, depth_values, h, w):
    """Plane-sweep sample coordinates.

    Reproduces depth_est_fusion.homo_warping:85-126's grid convention
    (pixel/((S-1)/2) - 1 fed to grid_sample(align_corners=False), i.e.
    effective sample position ``p * S/(S-1) - 0.5``).
    Returns x_eff, y_eff of shape (N, D, HW).
    """
    d = depth_values.shape[0]
    proj = src_proj @ jnp.linalg.inv(ref_proj)
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xyz = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(h * w)], axis=0)  # (3, HW)
    rot_xyz = jnp.einsum("nij,jk->nik", rot, xyz)  # (N, 3, HW)
    proj_xyz = rot_xyz[:, :, None, :] * depth_values.reshape(1, 1, d, 1) + trans[:, :, None, :]
    z = proj_xyz[:, 2]
    px = proj_xyz[:, 0] / z
    py = proj_xyz[:, 1] / z
    x_eff = px * (w / (w - 1)) - 0.5
    y_eff = py * (h / (h - 1)) - 0.5
    return x_eff, y_eff


def homo_warping(src_fea, src_proj, ref_proj, depth_values):
    """Plane-sweep warp of neighbor features into the reference view.
    src_fea: (N, C, H, W) -> (N, C, D, H, W)."""
    n, c, h, w = src_fea.shape
    d = depth_values.shape[0]
    x_eff, y_eff = _warp_grid(src_proj, ref_proj, depth_values, h, w)
    out = jax.vmap(grid_sample_2d)(src_fea, x_eff, y_eff)
    return out.reshape(n, c, d, h, w)


def plane_sweep_correlation(src_fea, ref_fea, src_proj, ref_proj, depth_values,
                            band=None):
    """Fused warp + dot-product correlation.

    Equivalent to ``(homo_warping(...) * ref_fea[:, :, None]).sum(1)/sqrt(C)``
    (depth_est_fusion.py:232-237) but never materializes the (N, C, D, H, W)
    warp.  With ``band`` set, uses the banded-Gram MXU path
    (ops/sweep_band.py — the channel dot commutes with the interpolation, so
    no per-sample gathers at all; exact when the band covers, which
    ``plane_sweep_band_violations`` verifies).  Otherwise on TPU dispatches
    to the coherent-gather Pallas kernel (ops/sweep_pallas.py); elsewhere it
    scans depth planes with the patch sampler so the peak activation is one
    (N, C, H, W) plane.
    """
    from ..ops.dfa3d import pallas_available

    if band is not None:
        from ..ops.sweep_band import plane_sweep_correlation_banded

        return plane_sweep_correlation_banded(
            src_fea, ref_fea, src_proj, ref_proj, depth_values, band
        )
    if pallas_available():
        from ..ops.sweep_pallas import plane_sweep_correlation_pallas

        return plane_sweep_correlation_pallas(
            src_fea, ref_fea, src_proj, ref_proj, depth_values
        )
    from ..ops.dfa3d_fast import bilinear_sample_patch

    n, c, h, w = src_fea.shape
    x_eff, y_eff = _warp_grid(src_proj, ref_proj, depth_values, h, w)
    src_img = jnp.transpose(src_fea, (0, 2, 3, 1))  # (N, H, W, C)
    ref_flat = jnp.transpose(ref_fea.reshape(n, c, -1), (0, 2, 1))  # (N, HW, C)

    @jax.checkpoint
    def one_plane(coords):
        xe, ye = coords  # (N, HW)
        warped = jax.vmap(bilinear_sample_patch)(src_img, xe, ye)  # (N, HW, C)
        return (warped * ref_flat).sum(axis=-1) / jnp.sqrt(jnp.float32(c))

    corr = jax.lax.map(one_plane, (x_eff.transpose(1, 0, 2), y_eff.transpose(1, 0, 2)))
    return corr.transpose(1, 0, 2).reshape(n, -1, h, w)  # (N, D, H, W)


class ConvBnReLU2D(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, 3, self.stride, 1, use_bias=False, name="conv")(x)
        x = BatchNorm(name="bn")(x, train)
        return nn.relu(x)


class SimpleUnet2D(nn.Module):
    """2-level residual U-Net (depth_est_fusion.py:139-163)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.channels
        conv0 = x
        conv2 = ConvBnReLU2D(2 * d, name="conv2")(
            ConvBnReLU2D(2 * d, stride=2, name="conv1")(conv0, train), train
        )
        y = ConvBnReLU2D(4 * d, name="conv4")(
            ConvBnReLU2D(4 * d, stride=2, name="conv3")(conv2, train), train
        )
        y = ConvTranspose(2 * d, 3, 2, padding=1, output_padding=1, use_bias=False, name="deconv9")(y)
        y = BatchNorm(name="debn9")(y, train)
        y = conv2 + nn.relu(y)
        y = ConvTranspose(d, 3, 2, padding=1, output_padding=1, use_bias=False, name="deconv11")(y)
        y = BatchNorm(name="debn11")(y, train)
        return conv0 + nn.relu(y)


class DepthNetFusion(nn.Module):
    """Depth distribution head; one scene (N views) per call — vmap over batch.

    Inputs:
      feats: (N, C_mono, H, W) FPN level-0 features (stride 4)
      imgs:  (N, 3, Hi, Wi) normalized images
      proj_feat: (N, 4, 4) K[R|t] at feature resolution (intrinsics prescaled
        by the caller with ratio = ori_h / (img_h / 4))
    Returns (N, D, H, W) softmax depth distributions.
    """

    dbound: tuple
    neighbor_img_num: int = 2
    mono_channels: int = 256
    sweep_band: int | None = None

    @property
    def depth_channels(self):
        return round((self.dbound[1] - self.dbound[0]) / self.dbound[2])

    @nn.compact
    def __call__(self, feats, imgs, proj_feat, train: bool = False):
        n = feats.shape[0]
        d_ch = self.depth_channels
        depth_values = jnp.asarray(
            np.arange(self.dbound[0], self.dbound[1], self.dbound[2], dtype=np.float32)
            + self.dbound[2] / 2
        )

        f_mvs = ResNetFPNMatching(output_dim=128, name="fnet_mvs")(imgs, train)
        ch = f_mvs.shape[1]

        k = min(self.neighbor_img_num, n - 1)
        neighbor_ids = get_closest_frame_ids(n, k)  # static (N, k)

        corr = jnp.zeros((n, d_ch) + f_mvs.shape[2:], f_mvs.dtype)
        for j in range(k):
            nei = neighbor_ids[:, j]
            corr = corr + plane_sweep_correlation(
                f_mvs[nei], f_mvs, proj_feat[nei], proj_feat, depth_values,
                band=self.sweep_band,
            )
        corr = corr / k

        cost_reg = SimpleUnet2D(d_ch, name="correlation_regulation")(corr, train)
        f_mono = ConvBnReLU2D(128, name="fnet_mono")(feats, train)
        mono_reg = SimpleUnet2D(128, name="mono_regulation")(f_mono, train)
        fused = SimpleUnet2D(d_ch + 128, name="fusion_regulation")(
            jnp.concatenate([cost_reg, mono_reg], axis=1), train
        )
        logits = Conv(d_ch, 3, 1, 1, name="depth_reg")(fused)
        # depth distributions must sum to exactly 1 (they reweight the value
        # sampling) — normalize in f32 regardless of the compute dtype
        return jax.nn.softmax(logits.astype(jnp.float32), axis=1)


def downsample_gt_depth(gt_depths, downsample_factor, dbound, depth_channels, max_tol=0):
    """GT depth -> one-hot bins at feature resolution with min-pooling.

    gt_depths: (N, H, W) meters (0 = invalid). Returns (N*h*w, D) float one-hot
    with optional +-max_tol bin tolerance (depth_est_fusion.py:254-309).
    """
    n, h, w = gt_depths.shape
    ds = downsample_factor
    g = gt_depths.reshape(n, h // ds, ds, w // ds, ds)
    g = jnp.transpose(g, (0, 1, 3, 2, 4)).reshape(n, h // ds, w // ds, ds * ds)
    g = jnp.where(g == 0.0, 1e5, g)
    g = g.min(axis=-1)
    g = (g - (dbound[0] - dbound[2])) / dbound[2]
    g = jnp.where((g < depth_channels + 1) & (g >= 0.0), g, 0.0)
    onehot = jax.nn.one_hot(g.astype(jnp.int32), depth_channels + 1)
    onehot = onehot.reshape(-1, depth_channels + 1)[:, 1:]
    if max_tol >= 1:
        acc = onehot
        for err in range(-max_tol, max_tol + 1):
            if err < 0:
                acc = acc + jnp.concatenate(
                    [acc[..., 1:], jnp.zeros_like(acc[..., :1])], axis=-1
                )
            elif err > 0:
                acc = acc + jnp.concatenate(
                    [jnp.zeros_like(acc[..., :1]), acc[..., :-1]], axis=-1
                )
        onehot = acc / (acc + 1e-5)
    return onehot


def depth_loss(gt_depths, depth_preds, downsample_factor, dbound, loss_weight=0.5, max_tol=0):
    """Masked BCE between predicted distribution and one-hot GT bins
    (depth_est_fusion.py:311-330). depth_preds: (N, D, H, W)."""
    d_ch = depth_preds.shape[1]
    labels = downsample_gt_depth(gt_depths, downsample_factor, dbound, d_ch, max_tol)
    preds = jnp.transpose(depth_preds, (0, 2, 3, 1)).reshape(-1, d_ch)
    fg = labels.max(axis=1) > 0.0
    preds = jnp.clip(preds, 1e-7, 1 - 1e-7)
    bce = -(labels * jnp.log(preds) + (1 - labels) * jnp.log(1 - preds))
    bce = jnp.where(fg[:, None], bce, 0.0).sum()
    return loss_weight * bce / jnp.maximum(fg.sum(), 1.0)
