"""Ad-hoc probe: grad throughput with the corner table folded in the
PRIMAL (wide rows below the scatter cliff, one-hot cell select forward,
unfold once per grad step in the pack's VJP) vs the unfolded layout.
See the fold note in sampling.py and benchmarks/scatter_fold.py."""

import sys
import time
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import probe_backend  # noqa: E402
from vpt_tpu import sampling, transfer, volume  # noqa: E402
from vpt_tpu.renderers import diff_mc, make_scene  # noqa: E402
from vpt_tpu.renderers import mcm as mcm_mod  # noqa: E402

probe_backend()
res, steps, frames, iters = 512, 8, 2, 6
tf = transfer.gray_ramp(alpha_scale=0.8)
params = mcm_mod.Params(extinction=40.0, anisotropy=0.3, steps=steps)
target = jnp.zeros((res, res, 3), jnp.float32)
events = res * res * steps * frames

for vol_n in (128, 256):
    vol = volume.sphere_volume(vol_n)
    template = make_scene(vol, tf, pack=False)
    auto = sampling.scatter_fold_log2(vol_n ** 3, 8, vol_n)
    for fold in (0, auto):
        def loss_fn(voxels, seed0, fold=fold):
            sc = dataclasses.replace(
                template, volume=voxels,
                volume_packed=sampling.pack_corner_volume(voxels, fold),
                transfer_packed=sampling.pack_corner_texture2d(
                    template.transfer))
            img = diff_mc.mcm_expected_image(sc, params, res, res, frames,
                                             seed0=0.3)
            return jnp.mean((img - target) ** 2)

        bwd = jax.jit(jax.value_and_grad(loss_fn))
        try:
            out = bwd(template.volume, 0.0)
            float(np.asarray(out[0] + jnp.sum(out[1][0, 0, 0])))
        except Exception as exc:  # noqa: BLE001
            print(f"{vol_n}^3 fold={fold}: FAILED "
                  f"{str(exc).splitlines()[0][:100]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(iters):
            out = bwd(template.volume, 0.0)
        float(np.asarray(out[0] + jnp.sum(out[1][0, 0, 0])))
        dt = (time.perf_counter() - t0) / iters
        print(f"{vol_n}^3 fold={fold}: {events / dt / 1e6:8.1f}M grad "
              f"events/s ({dt * 1e3:.0f} ms)", flush=True)
