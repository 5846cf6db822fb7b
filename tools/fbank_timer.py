#!/usr/bin/env python
"""Quick fbank-kernel timing on the real chip (salted-scan protocol)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters):
    def scanned(base_salt, *a):
        def body(carry, i):
            out = fn(base_salt + i.astype(jnp.float32), *a)
            out = out[0] if isinstance(out, tuple) else out
            return carry + jnp.sum(out.astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return total

    jfn = jax.jit(scanned)
    float(jax.device_get(jfn(jnp.float32(0), *args)))
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(jfn(jnp.float32(1000 * (rep + 1)), *args)))
        best = min(best, time.perf_counter() - t0)
    return best


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

        K = 16
        t1 = timed(fb, (wave,), K)
        t2 = timed(fb, (wave,), 2 * K)
        ms = (t2 - t1) / K * 1e3
        print(f"fused_fbank[{name}]: {ms:.3f} ms/iter  "
              f"({batch * utt_s / (ms / 1e3):.0f} audio-s/s)")


if __name__ == "__main__":
    main()
