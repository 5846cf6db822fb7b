#!/usr/bin/env python
"""Quick fbank-kernel timing on the real chip (salted-scan protocol)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from roofline import _timed_scan  # the one canonical timing protocol


def diff_ms(fn, args, iters=16):
    """Per-iteration ms via differential timing (cancels the tunnel RTT)."""
    t1 = _timed_scan(fn, args, iters)
    t2 = _timed_scan(fn, args, 2 * iters)
    return (t2 - t1) / iters * 1e3


def main():
    from asv_subtools_tpu.features import FbankOptions
    from asv_subtools_tpu.features.pallas_fbank import fused_fbank

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    sr, utt_s, batch = 16000, 10.0, 128
    opts = FbankOptions()
    wave = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, int(sr * utt_s))) * 1000.0,
        jnp.float32,
    )

    for name, dt_, we in [
        ("f32", jnp.float32, True),
        ("bf16", jnp.bfloat16, True),
        ("bf16,no-energy", jnp.bfloat16, False),
    ]:
        def fb(salt, w, dt_=dt_, we=we):
            f, e = fused_fbank(w * (1.0 + 1e-6 * salt), opts, dft_dtype=dt_,
                               with_energy=we)
            return f

        ms = diff_ms(fb, (wave,))
        print(f"fused_fbank[{name}]: {ms:.3f} ms/iter  "
              f"({batch * utt_s / (ms / 1e3):.0f} audio-s/s)")


if __name__ == "__main__":
    main()
