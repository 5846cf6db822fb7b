"""Fused Pallas fbank kernel: framing + window + DFT + mel in one pass.

The XLA path (functional.compute_fbank) materializes strided frames
[B, T, 512] in HBM (~2.6x the waveform bytes, written then re-read for the
window ops and DFT GEMMs). This kernel keeps everything in VMEM:

  per (batch row, tile of 128 frames):
    waveform row resident in VMEM (fetched once per batch row)
    build 128 overlapping frames in VMEM           (fori_loop row copies)
    remove DC, raw energy, preemphasis, window     (VPU, fused)
    power spectrum via two real-DFT GEMMs          (MXU, 512x256 tiles)
    mel projection + log                           (MXU + VPU)
    write [128, num_bins] + [128] log-energies

The [B, T, 512] frame tensor never exists in HBM; the DFT/mel matrices
stay resident in VMEM across the whole grid. Parity: compute_fbank
semantics at dither=0, snip_edges=True (the extraction path).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import EPSILON, FbankOptions
from .functional import dft_matrices, feature_window, mel_banks

TILE = 128  # frames per grid step


def _build_frames(wave2d, rows0, *, shift: int, padded: int):
    """Strided framing with only lane-ALIGNED ops.

    Mosaic cannot index the lane axis at non-multiples of 128, and
    shift=160 is not one — so frames are built from the lcm structure:
    lcm(shift, 128) = one "group" of `fpg` frames spanning `rpg` rows of
    128 lanes. Frames fall into `fpg` alignment classes; each class k is a
    static lane-rotation of the waveform (by (k*shift) % 128) followed by
    static strided row reshapes. No dynamic misaligned access anywhere.

    wave2d: ref [1, R_total, 128]; rows0: aligned row offset of this tile.
    Returns frames [TILE, padded].
    """
    lane = 128
    g = math.gcd(shift, lane)
    fpg = lane // g  # frames per group (4 for shift=160)
    rpg = shift // g  # rows per group (5 for shift=160)
    chunks_per_frame = padded // lane
    m_groups = TILE // fpg
    # rows needed: last chunk row = rpg*(m_groups-1) + (fpg-1) + chunks-1,
    # +rpg for the rolled next-group copy, +1 for the lane-rotation carry
    rows_used = rpg * m_groups + fpg + chunks_per_frame + rpg
    rows_load = -(-rows_used // 8) * 8  # sublane slices must be x8

    a = wave2d[0, pl.ds(rows0, rows_load), :]  # [rows_load, 128] value
    a1 = jnp.concatenate([a[1:], a[:1]], axis=0)  # rows shifted up by one

    groups_needed = rows_used // rpg
    class_frames = []
    for k in range(fpg):
        sh = (k * shift) % lane
        if sh == 0:
            rk = a
        else:
            # circular left-roll by sh == right-roll by (lane - sh)
            ra = pltpu.roll(a, lane - sh, axis=1)
            rb = pltpu.roll(a1, lane - sh, axis=1)
            lane_id = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            rk = jnp.where(lane_id < lane - sh, ra, rb)
        rk5 = rk[: groups_needed * rpg].reshape(groups_needed, rpg, lane)
        rk5n = jnp.concatenate([rk5[1:], rk5[:1]], axis=0)
        chunks = []
        for c in range(chunks_per_frame):
            grp, idx = divmod(k + c, rpg)
            src = rk5 if grp == 0 else rk5n
            chunks.append(src[:m_groups, idx, :])  # [m_groups, 128]
        class_frames.append(jnp.concatenate(chunks, axis=1))  # [m_groups, padded]
    # interleave classes: frame i = fpg*m + k
    stacked = jnp.stack(class_frames, axis=1)  # [m_groups, fpg, padded]
    return stacked.reshape(TILE, padded)


def _kernel(
    wave_ref,  # [1, R_total, 128] VMEM — whole padded waveform row (2D)
    cos_ref,  # [padded, keep] VMEM
    sin_ref,  # [padded, keep] VMEM
    mel_ref,  # [keep, num_bins] VMEM
    win_ref,  # [1, padded] VMEM (window coeffs, zero in the pad region)
    out_ref,  # [1, TILE, 1 + num_bins] VMEM: col 0 = log-energy, 1.. = mel
    *,
    shift: int,
    window: int,
    padded: int,
    preemph: float,
    remove_dc: bool,
    use_log: bool,
    use_power: bool,
    dft_bf16: bool,
):
    # row offset of this tile: TILE*shift samples = TILE*shift/128 rows
    rows0 = pl.program_id(1) * (TILE * shift // 128)
    frames = _build_frames(wave_ref, rows0, shift=shift, padded=padded)

    # valid-region mask over the padded axis
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE, padded), 1)
    valid = col < window
    frames = jnp.where(valid, frames, 0.0)

    # 2. window processing
    if remove_dc:
        mean = jnp.sum(frames, axis=1, keepdims=True) / float(window)
        frames = jnp.where(valid, frames - mean, 0.0)
    energy = jnp.sum(frames * frames, axis=1)
    out_ref[0, :, 0] = jnp.log(jnp.maximum(energy, EPSILON))
    if preemph != 0.0:
        # x'[j] = x[j] - p*x[j-1]; x'[0] = x[0]*(1-p) via duplicated first col
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = jnp.where(valid, frames - preemph * prev, 0.0)
    frames = frames * win_ref[0][None, :]

    # 3. power spectrum on the MXU. Default float32 (golden parity); the
    # production extraction path passes dft_bf16=True: the DFT tables are
    # shipped as bf16 and frames are rounded to bf16 just for the two
    # GEMMs (f32 accumulate), quadrupling MXU throughput on the kernel's
    # dominant cost. Feature error is ~2^-8 relative per spectral bin,
    # below the bf16 backbone's own activation rounding (embedding cosine
    # vs the f32 front-end validated on chip; cf. the int8 serving wire at
    # cosine 0.99998 with only 8-bit features).
    fr = frames.astype(jnp.bfloat16) if dft_bf16 else frames
    # HIGHEST asks Mosaic for an fp32 contract, which rejects bf16 operands
    prec = (jax.lax.Precision.DEFAULT if dft_bf16
            else jax.lax.Precision.HIGHEST)
    re = jnp.dot(fr, cos_ref[:], preferred_element_type=jnp.float32,
                 precision=prec)
    im = jnp.dot(fr, sin_ref[:], preferred_element_type=jnp.float32,
                 precision=prec)
    power = re * re + im * im
    if not use_power:
        power = jnp.sqrt(power)

    # 4. mel + log
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    if use_log:
        mel = jnp.log(jnp.maximum(mel, EPSILON))
    out_ref[0, :, 1:] = mel


@functools.partial(jax.jit, static_argnames=("opts", "interpret", "dft_dtype"))
def fused_fbank(
    wave: jax.Array,
    opts: FbankOptions = FbankOptions(),
    interpret: Optional[bool] = None,
    dft_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """wave [B, S] -> (log-mel [B, T, num_bins], log-energy [B, T]).

    snip_edges=True, dither=0 semantics (the extraction path). The kernel
    computes ceil(T/128)*128 frames; the result is sliced to the Kaldi
    frame count T.

    dft_dtype=jnp.bfloat16 runs the two DFT GEMMs (the kernel's dominant
    cost) at bf16 MXU rate with f32 accumulation — the production
    extraction/training default; keep f32 for golden-parity work.
    """
    if interpret is None:
        # pallas compiles only for TPU; CPU (tests, virtual mesh) interprets
        interpret = jax.default_backend() == "cpu"
    fo = opts.frame_opts
    if fo.dither != 0.0 or not fo.snip_edges:
        raise ValueError("fused_fbank supports dither=0, snip_edges=True")
    b, s = wave.shape
    shift, window, padded = fo.window_shift, fo.window_size, fo.padded_window_size
    t = fo.num_frames(s)
    if t <= 0:
        raise ValueError("waveform too short")
    tiles = -(-t // TILE)
    if shift % 8 or padded % 128 or (TILE * shift) % 128:
        raise ValueError("frame geometry not TPU-tileable")
    # pad so the last tile's row window exists (mirror of _build_frames math)
    lane = 128
    g = math.gcd(shift, lane)
    fpg, rpg = lane // g, shift // g
    rows_used = rpg * (TILE // fpg) + fpg + padded // lane + rpg
    rows_load = -(-rows_used // 8) * 8
    rows_needed = (tiles - 1) * (TILE * shift // lane) + rows_load
    needed = rows_needed * lane
    wave_p = jnp.pad(wave.astype(jnp.float32), ((0, 0), (0, max(0, needed - s))))
    wave_p = wave_p.reshape(b, -1, lane)  # [B, R_total, 128]
    r_total = wave_p.shape[1]

    keep = padded // 2
    c, si = dft_matrices(padded, keep)
    mel = mel_banks(opts.mel_opts, fo)
    win = np.zeros(padded, np.float32)
    win[:window] = feature_window(fo)

    num_bins = opts.mel_opts.num_bins
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            shift=shift,
            window=window,
            padded=padded,
            preemph=fo.preemph_coeff,
            remove_dc=fo.remove_dc_offset,
            use_log=opts.use_log_fbank,
            use_power=opts.use_power,
            dft_bf16=dft_dtype == jnp.bfloat16,
        ),
        grid=(b, tiles),
        in_specs=[
            # whole waveform row: same block across the tile axis, so pallas
            # fetches it once per batch row and reuses it for every tile
            pl.BlockSpec((1, r_total, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((padded, keep), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((padded, keep), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((keep, num_bins), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, padded), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, 1 + num_bins), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, tiles * TILE, 1 + num_bins), jnp.float32),
        interpret=interpret,
    )(
        wave_p,
        jnp.asarray(c, dft_dtype),
        jnp.asarray(si, dft_dtype),
        jnp.asarray(mel),
        jnp.asarray(win)[None, :],
    )
    combined = out
    return combined[:, :t, 1:], combined[:, :t, 0]
