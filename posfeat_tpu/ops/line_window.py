"""TPU-fused Line2Window correspondence engine.

The reference pipeline (preprocess.py:83-104) runs two gather-heavy
stages per direction: 100 bilinear probes along each query's epipolar
line (putils:661-694), then a wh×ww windowed soft-argmax around the hit
(putils:721-758). On TPU both are gather-bound: every probe/window sample
fetches a 128-d descriptor only to be dotted with the query.

This engine restructures the math around one dense correlation map per
query chunk:

    pf[b, p, y, x] = ⟨featmap2[b, y, x, :], feat1[b, p, :]⟩   (one MXU matmul)

and then

  * line stage: argmax of pf over the pixels within a ±0.71-px band of
    the epipolar line (pure VPU mask+reduce). Denser than the reference's
    100 discrete probes; the stage is stop-gradient and only seeds the
    window (plus ±0.707·ws jitter), so this is a TPU-native redesign of
    an internal search, not an output-contract change.
  * window stage: a [ph, pw] patch of pf is sliced at the center and the
    exact reference window expectation is computed with separable
    bilinear interpolation matrices (Ry · patch · Rxᵀ) — identical math
    to grid_sample + dot + softmax (parity-tested), zero gathers.

Gradients flow through pf into featmap2/feat1 exactly as in the
reference's window stage (matmul + contiguous patch-slice adjoints
instead of millions of scatter-adds).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .coords import gen_grid, homogenize
from .epipolar import get_endpoints


def _window_geometry(Hf: int, Wf: int, ws: float):
    import numpy as np

    wh, ww = int(ws * Hf), int(ws * Wf)
    # numpy here: geometry must stay concrete under jit tracing
    oy = np.linspace(-ws, ws, wh, dtype=np.float32)
    ox = np.linspace(-ws, ws, ww, dtype=np.float32)
    gx, gy = np.meshgrid(ox, oy, indexing="xy")
    offsets = jnp.asarray(np.stack([gx, gy], -1).reshape(-1, 2))  # [K, 2]
    off_x = jnp.asarray(ox)
    off_y = jnp.asarray(oy)
    pw = int((ox[-1] - ox[0]) * Wf / 2) + 3
    ph = int((oy[-1] - oy[0]) * Hf / 2) + 3
    return wh, ww, offsets, off_x, off_y, ph, pw


def _correlation_maps(fm_flat: jnp.ndarray, f1k: jnp.ndarray, Hf: int, Wf: int):
    """fm_flat: [B, Hf*Wf, D], f1k: [B, C, D] -> pf [B, C, Hf, Wf] f32."""
    B, C, _ = f1k.shape
    pf = jax.lax.dot_general(
        f1k,
        fm_flat,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return pf.reshape(B, C, Hf, Wf)


def _window_from_pf(pf, centers_n, geometry):
    """Reference window soft-argmax from a correlation map.

    pf: [B, C, Hf, Wf]; centers_n: [B, C, 2] normalized.
    Returns (expected_n [B, C, 2], std [B, C]).
    """
    B, C, Hf, Wf = pf.shape
    wh, ww, offsets, off_x, off_y, ph, pw = geometry

    px = ((centers_n[..., 0:1] + off_x[None, None] + 1) * Wf - 1) / 2  # [B,C,ww]
    py = ((centers_n[..., 1:2] + off_y[None, None] + 1) * Hf - 1) / 2  # [B,C,wh]
    ox = jnp.clip(jnp.floor(px[..., 0]).astype(jnp.int32), 0, Wf - pw)
    oy = jnp.clip(jnp.floor(py[..., 0]).astype(jnp.int32), 0, Hf - ph)

    def slice_patch(pf_bc, oy_bc, ox_bc):
        return jax.lax.dynamic_slice(pf_bc, (oy_bc, ox_bc), (ph, pw))

    patches = jax.vmap(jax.vmap(slice_patch))(pf, oy, ox)  # [B, C, ph, pw]

    ip = jnp.arange(ph, dtype=jnp.float32)
    iq = jnp.arange(pw, dtype=jnp.float32)
    gy = oy[..., None, None].astype(jnp.float32) + ip  # [B, C, 1, ph]
    gx = ox[..., None, None].astype(jnp.float32) + iq
    ry = jax.nn.relu(1.0 - jnp.abs(py[..., :, None] - gy))  # [B, C, wh, ph]
    rx = jax.nn.relu(1.0 - jnp.abs(px[..., :, None] - gx))  # [B, C, ww, pw]
    # grid_sample zeros-padding: drop out-of-image corners (low side is
    # impossible: origins are clamped >= 0)
    ry = ry * (gy <= Hf - 1).astype(ry.dtype)
    rx = rx * (gx <= Wf - 1).astype(rx.dtype)

    sim = jnp.einsum(
        "bcip,bcpq,bcjq->bcij", ry, patches, rx,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, C, wh, ww]
    prob = jax.nn.softmax(sim.reshape(B, C, wh * ww), axis=-1)

    coords = centers_n[:, :, None, :] + offsets[None, None]  # [B, C, K, 2]
    expected = jnp.sum(coords * prob[..., None], axis=2)
    var = jnp.sum(coords**2 * prob[..., None], axis=2) - expected**2
    std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10, None)), axis=-1)
    return expected, std


def _line_band_argmax(pf_sg, abc, band_px, use_nn):
    """Band-masked (arg)max over the correlation map.

    pf_sg: [B, C, Hf, Wf] (stop-gradient); abc: 3×[B, C] normalized line
    coefficients in featmap-pixel frame. Returns (center_n [B,C,2],
    band_ok [B,C])."""
    B, C, Hf, Wf = pf_sg.shape
    a, b, c = abc
    ys = jax.lax.broadcasted_iota(jnp.float32, (Hf, Wf), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Hf, Wf), 1)
    dist = jnp.abs(
        a[..., None, None] * xs + b[..., None, None] * ys + c[..., None, None]
    )
    band = dist <= band_px
    masked = jnp.where(band, pf_sg, -jnp.inf)
    flat = masked.reshape(B, C, Hf * Wf)
    if use_nn:
        idx = jnp.argmax(flat, axis=-1)
        cy = (idx // Wf).astype(jnp.float32)
        cx = (idx % Wf).astype(jnp.float32)
    else:
        p = jax.nn.softmax(flat, axis=-1).reshape(B, C, Hf, Wf)
        cy = jnp.sum(p * ys, axis=(-1, -2))
        cx = jnp.sum(p * xs, axis=(-1, -2))
    band_ok = jnp.isfinite(flat.max(axis=-1))
    cx_n = (2 * cx + 1) / Wf - 1
    cy_n = (2 * cy + 1) / Hf - 1
    return jnp.stack([cx_n, cy_n], axis=-1), band_ok


def _chunked(x, B, n_chunks, chunk, pad_n):
    widths = [(0, 0), (0, pad_n)] + [(0, 0)] * (x.ndim - 2)
    x = jnp.pad(x, widths)
    x = x.reshape((B, n_chunks, chunk) + x.shape[2:])
    return jnp.moveaxis(x, 1, 0)


def _unchunked(x, B, N):
    x = jnp.moveaxis(x, 0, 1)  # [B, n_chunks, chunk, ...]
    return x.reshape((B, -1) + x.shape[3:])[:, :N]


def window_expectation_fused(
    featmap2: jnp.ndarray,
    feat1: jnp.ndarray,
    centers_n: jnp.ndarray,
    window_size: float,
    chunk: int = 64,
):
    """Standalone fused window stage (== reference
    get_expected_correspondence_within_window's (expected, std))."""
    B, Hf, Wf, D = featmap2.shape
    N = feat1.shape[1]
    geometry = _window_geometry(Hf, Wf, window_size)
    fm_flat = featmap2.reshape(B, Hf * Wf, D)

    n_chunks = -(-N // chunk)
    pad_n = n_chunks * chunk - N
    f1_c = _chunked(feat1, B, n_chunks, chunk, pad_n)
    ct_c = _chunked(centers_n, B, n_chunks, chunk, pad_n)

    def per_chunk(carry, args):
        f1k, ctk = args
        pf = _correlation_maps(fm_flat, f1k, Hf, Wf)
        return carry, _window_from_pf(pf, ctk, geometry)

    _, (exp_c, std_c) = jax.lax.scan(per_chunk, 0.0, (f1_c, ct_c))
    return _unchunked(exp_c, B, N), _unchunked(std_c, B, N)


def fused_line_window(
    featmap2: jnp.ndarray,
    feat1: jnp.ndarray,
    coord1: jnp.ndarray,
    fmat: jnp.ndarray,
    h_img: int,
    w_img: int,
    *,
    key: jax.Array,
    window_size: float,
    use_nn: bool = True,
    loc_rand: bool = True,
    band_px: float = 0.71,
    chunk: int = 64,
) -> Tuple[jnp.ndarray, ...]:
    """Fused line search + window refinement.

    Returns (center_n [B,N,2] post-jitter, center_org_n, valid [B,N],
    win_expected_n [B,N,2], win_std [B,N]).
    """
    B, Hf, Wf, D = featmap2.shape
    N = feat1.shape[1]
    ws = window_size
    geometry = _window_geometry(Hf, Wf, ws)

    # epipolar lines in featmap-pixel frame: image px X = (2cW/Wf)·xf + cW/Wf
    cW, cH = (w_img - 1) / 2.0, (h_img - 1) / 2.0
    line = jnp.matmul(
        fmat, homogenize(coord1).transpose(0, 2, 1),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, 3, N]
    a = line[:, 0] * (2 * cW / Wf)
    b = line[:, 1] * (2 * cH / Hf)
    c = line[:, 2] + line[:, 0] * (cW / Wf) + line[:, 1] * (cH / Hf)
    inv_norm = jax.lax.rsqrt(jnp.clip(a * a + b * b, 1e-20))
    a, b, c = a * inv_norm, b * inv_norm, c * inv_norm  # [B, N]

    _, _, valid_ep = get_endpoints(coord1, fmat, h_img, w_img)

    n_chunks = -(-N // chunk)
    pad_n = n_chunks * chunk - N
    f1_c = _chunked(feat1, B, n_chunks, chunk, pad_n)
    a_c = _chunked(a, B, n_chunks, chunk, pad_n)
    b_c = _chunked(b, B, n_chunks, chunk, pad_n)
    c_c = _chunked(c, B, n_chunks, chunk, pad_n)
    keys = jax.random.split(key, n_chunks)

    fm_flat = featmap2.reshape(B, Hf * Wf, D)

    def per_chunk(carry, args):
        f1k, ak, bk, ck, kk = args
        pf = _correlation_maps(fm_flat, f1k, Hf, Wf)

        center_org, band_ok = _line_band_argmax(
            jax.lax.stop_gradient(pf), (ak, bk, ck), band_px, use_nn
        )
        center = center_org
        if loc_rand:
            jit = 0.707 * ws * (
                2 * jax.random.uniform(kk, center.shape, jnp.float32) - 1
            )
            center = center + jit
        border_ok = (
            (center[..., 0] >= -1) & (center[..., 0] <= 1)
            & (center[..., 1] >= -1) & (center[..., 1] <= 1)
        )
        center = jax.lax.stop_gradient(center)

        expected, std = _window_from_pf(pf, center, geometry)
        return carry, (center, center_org, band_ok & border_ok, expected, std)

    _, (ct, ct_org, ok, win_exp, win_std) = jax.lax.scan(
        per_chunk, 0.0, (f1_c, a_c, b_c, c_c, keys)
    )

    centers = _unchunked(ct, B, N)
    centers_org = _unchunked(ct_org, B, N)
    ok = _unchunked(ok, B, N)
    win_exp = _unchunked(win_exp, B, N)
    win_std = _unchunked(win_std, B, N)
    return centers, centers_org, valid_ep & ok, win_exp, win_std
