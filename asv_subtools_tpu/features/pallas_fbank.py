"""Fused Pallas fbank kernel: framing + window + DFT + mel in one pass.

The XLA path (functional.compute_fbank) materializes strided frames
[B, T, 512] in HBM (~2.6x the waveform bytes, written then re-read for the
window ops and DFT GEMMs). This kernel keeps everything in VMEM — and it
never materializes frames AT ALL:

  Frames fall into groups of `fpg = 128/gcd(shift,128)` frames spanning
  `rpg = shift/gcd` rows of 128 lanes; every group starts ROW-ALIGNED.
  Window processing is linear, so DC-removal, preemphasis and the window
  fold into the DFT matrices on the host (E = M0·D·A·diag(win), then
  eff = E @ C). The per-group DFT then becomes a CONVOLUTION against a
  block-structured matrix K[n, l*keep + k] = eff[n - l*shift, k]: per
  row-offset r of the group span, one GEMM of the raw waveform rows
  [m_groups, 128] @ K[r*128:(r+1)*128, active-cols] accumulates every
  frame of every group — total MACs identical to the dense per-frame DFT
  (the active-column slices skip K's structural zeros).

  per (batch row, tile of 128 frames):
    waveform row resident in VMEM (fetched once per batch row)
    <= span_rows (7 for 25ms/10ms) strided row-slices — the ONLY data
       movement; no rolls, no frame concats, no sublane interleave
       (v1 built frames explicitly: 63% of kernel time on the VPU)
    re/im accumulation via the conv-GEMMs                 (MXU)
    raw-energy sums from the same row slices              (VPU)
    power spectrum, per-frame-slot mel GEMM + log         (MXU + VPU)
    write [m_groups, fpg*(1+nb)] — frame-major after a free host reshape

  The tile height adapts to the utterance (128/256/512 frames) so the
  conv-GEMMs run at full MXU height (m_groups = TILE/fpg rows: 128 for
  TILE=512) without wasting frames on short utterances; re and im share
  one GEMM per slot ([mg, padded] @ [padded, 2*keep]).

Parity: compute_fbank semantics at dither=0, snip_edges=True (the
extraction path). Reference spec: kaldifeat feature-window.cc /
feature-fbank.cc (see features/functional.py for the golden
transcription).
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

TILE_CHOICES = (512, 256, 128)  # frames per grid step (prefer tall GEMMs)


def _pick_tile(t: int, fpg: int) -> int:
    """Largest tile that doesn't inflate the computed frame count: full
    MXU-height conv-GEMMs (m_groups = tile/fpg) for long utterances,
    smaller tiles so short utterances don't pay for padding frames."""
    best = None
    for tile in TILE_CHOICES:
        computed = -(-t // tile) * tile
        key = (computed, -tile)
        if best is None or key < best[0]:
            best = (key, tile)
    return best[1]


def _geometry(shift: int, window: int, padded: int):
    """Group structure: fpg frames per row-aligned group, rpg rows each.

    Slot l starts at in-span lane offset (l*shift) % 128; its K row block
    must cover offset + window samples (NOT `padded` — a misaligned slot's
    window tail extends past a padded-sized block: silently-wrong features
    at 30/32 ms windows in the first v3 cut). Rows of the effective DFT
    matrix past the window are structurally zero, so per-slot blocks stop
    at offset + window rounded up to a lane.
    """
    lane = 128
    g = math.gcd(shift, lane)
    fpg = lane // g  # frames per group (4 for shift=160)
    rpg = shift // g  # rows per group (5 for shift=160)
    slot_chunks = [
        -(-((l * shift) % lane + window) // lane) for l in range(fpg)
    ]
    span_rows = max(
        (l * shift) // lane + slot_chunks[l] for l in range(fpg)
    )
    return fpg, rpg, span_rows, tuple(slot_chunks)


def _conv_dft_arrays(opts: FbankOptions):
    """Host-side f64 precompute: window processing folded into
    conv-blocked DFT matrices + per-row-offset active column blocks."""
    fo = opts.frame_opts
    shift, window, padded = fo.window_shift, fo.window_size, fo.padded_window_size
    lane = 128
    fpg, rpg, span_rows, slot_chunks = _geometry(shift, window, padded)
    w = window

    # E = M0 · D · A · diag(win) acting on row-vector frames (f @ E):
    #   M0 zeroes samples past the window, D subtracts the window mean,
    #   A applies preemphasis (x'[j] = x[j] - p*x[j-1], x'[0] *= (1-p)),
    #   diag(win) multiplies the window function.
    e = np.zeros((padded, padded), np.float64)
    e[:w, :w] = np.eye(w)
    if fo.remove_dc_offset:
        e[:w, :w] -= 1.0 / w
    if fo.preemph_coeff != 0.0:
        p = float(fo.preemph_coeff)
        a = np.eye(padded)
        a[np.arange(w - 1), np.arange(1, w)] = -p
        a[0, 0] = 1.0 - p
        e = e @ a
    win = np.zeros(padded, np.float64)
    win[:w] = feature_window(fo)
    e = e * win[None, :]  # right-multiply by diag(win)

    keep = padded // 2
    c, si = dft_matrices(padded, keep)
    effc = e @ np.asarray(c, np.float64)  # [padded, keep]
    effs = e @ np.asarray(si, np.float64)

    # merged per-slot [cos | sin] blocks: slot l's GEMM is
    # x @ kcs[r0:r0+padded, l*2*keep:(l+1)*2*keep] -> [re | im]
    n_rows = span_rows * lane
    kcs = np.zeros((n_rows, fpg * 2 * keep), np.float32)
    for l in range(fpg):
        lo = l * shift
        hi = min(lo + padded, n_rows)
        kcs[lo:hi, l * 2 * keep : l * 2 * keep + keep] = effc[: hi - lo]
        kcs[lo:hi, l * 2 * keep + keep : (l + 1) * 2 * keep] = effs[: hi - lo]

    return kcs, keep, fpg, rpg, span_rows, slot_chunks


def _kernel(
    wave_ref,  # [1, R_total, 128] VMEM — whole padded waveform row
    kcs_ref,  # [span_rows*128, fpg*2*keep] conv-blocked [cos|sin] per slot
    mel_ref,  # [keep, num_bins]
    out_ref,  # [1, m_groups, fpg*(1+nb)]: per frame slot [log-energy, mel]
    *,
    tile: int,
    shift: int,
    window: int,
    padded: int,
    nb: int,
    keep: int,
    fpg: int,
    rpg: int,
    span_rows: int,
    slot_chunks: tuple,
    remove_dc: bool,
    use_log: bool,
    use_power: bool,
    dft_bf16: bool,
    with_energy: bool,
):
    lane = 128
    m_groups = tile // fpg
    rows_per_tile = tile * shift // lane
    rows0 = pl.program_id(1) * rows_per_tile
    g_extra = -(-span_rows // rpg)
    rows_load = -(-((m_groups + g_extra) * rpg) // 8) * 8
    a = wave_ref[0, pl.ds(rows0, rows_load), :]  # [rows_load, 128]
    a_g = a[: (m_groups + g_extra) * rpg].reshape(m_groups + g_extra, rpg, lane)

    prec = (jax.lax.Precision.DEFAULT if dft_bf16
            else jax.lax.Precision.HIGHEST)
    # the span_rows (<=7) strided slabs are shared across all frame slots;
    # when the GEMMs run in bf16 and energy is off, cast the slabs ONCE and
    # concat in bf16 (half the lane-copy bytes, f32 frames never built)
    rows = []
    for r in range(span_rows):
        q, rem = divmod(r, rpg)
        rows.append(a_g[q : q + m_groups, rem, :])  # [m_groups, 128]
    gemm_rows = (
        [r.astype(jnp.bfloat16) for r in rows]
        if dft_bf16 and not with_energy else rows
    )

    pieces = []
    for l in range(fpg):
        # slot l's window lives in the row-aligned span starting at row
        # rlo; K's row block absorbs the in-span lane offset, so it must
        # cover offset + window samples (slot_chunks rows, which can
        # exceed padded//lane for misaligned slots with long windows)
        rlo = (l * shift) // lane
        chunks = slot_chunks[l]
        width_l = chunks * lane
        al = jnp.concatenate(gemm_rows[rlo : rlo + chunks], axis=1)
        x = al.astype(jnp.bfloat16) if dft_bf16 else al
        r0 = rlo * lane
        reim = jnp.dot(
            x, kcs_ref[r0 : r0 + width_l, l * 2 * keep : (l + 1) * 2 * keep],
            preferred_element_type=jnp.float32, precision=prec,
        )
        re, im = reim[:, :keep], reim[:, keep:]
        power = re * re + im * im
        if not use_power:
            power = jnp.sqrt(power)
        mel = jnp.dot(power, mel_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        if use_log:
            mel = jnp.log(jnp.maximum(mel, EPSILON))
        if with_energy:
            # raw energy over the true window (f32, exact): local offset
            # of the frame within its span
            o = l * shift - r0
            col = jax.lax.broadcasted_iota(jnp.int32, (1, width_l), 1)
            m = ((col >= o) & (col < o + window)).astype(jnp.float32)
            am = al * m
            es = jnp.sum(am, axis=1)
            es2 = jnp.sum(am * al, axis=1)
            energy = es2 - es * es / float(window) if remove_dc else es2
            log_e = jnp.log(jnp.maximum(energy, EPSILON))
            mel = jnp.concatenate([log_e[:, None], mel], axis=1)
        pieces.append(mel)
    out_ref[0, :, :] = jnp.concatenate(pieces, axis=1)


@functools.partial(
    jax.jit, static_argnames=("opts", "interpret", "dft_dtype", "with_energy")
)
def fused_fbank(
    wave: jax.Array,
    opts: FbankOptions = FbankOptions(),
    interpret: Optional[bool] = None,
    dft_dtype=jnp.float32,
    with_energy: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """wave [B, S] -> (log-mel [B, T, num_bins], log-energy [B, T]).

    with_energy=False skips the raw log-energy branch entirely (masked
    VPU sums per frame slot) and returns (fbank, None) — the extraction
    and wave-input training paths discard it, and inside pallas XLA
    cannot DCE it for them.

    snip_edges=True, dither=0 semantics (the extraction path). The kernel
    computes ceil(T/128)*128 frames; the result is sliced to the Kaldi
    frame count T.

    dft_dtype=jnp.bfloat16 runs the conv-DFT GEMMs (the kernel's dominant
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

    kcs, keep, fpg, rpg, span_rows, slot_chunks = _conv_dft_arrays(opts)
    tile = _pick_tile(t, fpg)
    tiles = -(-t // tile)
    if shift % 8 or padded % 128 or (tile * shift) % 128 or tile % fpg:
        raise ValueError("frame geometry not TPU-tileable")
    lane = 128
    m_groups = tile // fpg
    g_extra = -(-span_rows // rpg)
    rows_load = -(-((m_groups + g_extra) * rpg) // 8) * 8
    rows_per_tile = tile * shift // lane
    rows_needed = (tiles - 1) * rows_per_tile + rows_load
    needed = rows_needed * lane
    wave_p = jnp.pad(wave.astype(jnp.float32), ((0, 0), (0, max(0, needed - s))))
    wave_p = wave_p.reshape(b, -1, lane)  # [B, R_total, 128]
    r_total = wave_p.shape[1]

    mel = mel_banks(opts.mel_opts, fo)
    nb = opts.mel_opts.num_bins
    per_frame = (1 + nb) if with_energy else nb
    width = fpg * per_frame

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            tile=tile,
            shift=shift,
            window=window,
            padded=padded,
            nb=nb,
            keep=keep,
            fpg=fpg,
            rpg=rpg,
            span_rows=span_rows,
            slot_chunks=slot_chunks,
            remove_dc=fo.remove_dc_offset,
            use_log=opts.use_log_fbank,
            use_power=opts.use_power,
            dft_bf16=dft_dtype == jnp.bfloat16,
            with_energy=with_energy,
        ),
        grid=(b, tiles),
        in_specs=[
            # whole waveform row: same block across the tile axis, so pallas
            # fetches it once per batch row and reuses it for every tile
            pl.BlockSpec((1, r_total, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((span_rows * lane, fpg * 2 * keep),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((keep, nb), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m_groups, width), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, tiles * m_groups, width),
                                       jnp.float32),
        interpret=interpret,
    )(
        wave_p,
        jnp.asarray(kcs, dft_dtype),
        jnp.asarray(mel),
    )
    # [B, tiles*m_groups, fpg, per_frame] -> frame-major: a free reshape
    # (frame index = tile_idx*tile + group*fpg + slot matches memory order)
    combined = out.reshape(b, tiles * tile, per_frame)
    if not with_energy:
        return combined[:, :t, :], None
    return combined[:, :t, 1:], combined[:, :t, 0]
