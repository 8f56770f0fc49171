"""Stage-by-stage TPU timing of the ORB front end (ROADMAP item 3).

The tunneled backend has ~1-3 ms per-dispatch overhead, so naive per-stage
jits measure mostly dispatch. Each stage is instead repeated R times inside
one jitted lax.scan whose carry perturbs the input (defeating CSE/hoisting);
reported time is (scan_time - scan_overhead) / R.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

R = 64


def _timed(fn, *args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def scan_time(stage, img, iters=8):
    """stage: img -> scalar-ish pytree. Returns per-call ms inside a scan."""

    def body(carry, _):
        out = stage(carry)
        leaf = jax.tree_util.tree_leaves(out)[0]
        bump = (leaf.reshape(-1)[0].astype(jnp.float32) % 1.0) * 1e-12
        return carry + bump, None

    def run(im):
        final, _ = jax.lax.scan(body, im, None, length=R)
        return final

    base = _timed(jax.jit(lambda im: jax.lax.scan(lambda c, _: (c + 1e-12, None), im, None, length=R)[0]), img, iters=iters)
    t = _timed(jax.jit(run), img, iters=iters)
    return (t - base) / R


def main():
    from tpuslam.ops.image import build_pyramid
    from tpuslam.ops.orb import (
        ORBConfig,
        fast_nms,
        _orient_and_describe_at,
        _select_level_keypoints,
        extract_orb,
        fast_response,
    )

    cfg = ORBConfig(n_features=1000)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    budgets = cfg.level_budgets()

    def pyr_stage(im):
        return jnp.stack([l.sum() for l in build_pyramid(im, cfg.n_levels, cfg.scale_factor)])

    print(f"pyramid          {scan_time(pyr_stage, img):7.3f} ms")

    def fast_stage(im):
        levels = build_pyramid(im, cfg.n_levels, cfg.scale_factor)
        return jnp.stack([fast_nms(l, cfg.min_th_fast).sum() for l in levels])

    t_pf = scan_time(fast_stage, img)
    print(f"pyr+fast+nms     {t_pf:7.3f} ms")

    def sel_stage(im):
        levels = build_pyramid(im, cfg.n_levels, cfg.scale_factor)
        acc = []
        for l, lv in enumerate(levels):
            s = fast_nms(lv, cfg.min_th_fast)
            xy, resp, valid = _select_level_keypoints(s, budgets[l], cfg.cell_size, cfg.ini_th_fast)
            acc.append(resp.sum())
        return jnp.stack(acc)

    t_pfs = scan_time(sel_stage, img)
    print(f"pyr+fast+select  {t_pfs:7.3f} ms")

    def ext_stage(im):
        f = extract_orb(im, cfg)
        return f.response.sum() + f.desc.sum().astype(jnp.float32)

    t_ext = scan_time(ext_stage, img)
    print(f"extract_orb      {t_ext:7.3f} ms  (orient+desc ~ {t_ext - t_pfs:.3f})")

    from __graft_entry__ import entry

    step, args = entry()

    def step_stage(im):
        out = step(im, *args[1:])
        return out[2].astype(jnp.float32)

    t_step = scan_time(step_stage, img)
    print(f"full step        {t_step:7.3f} ms  (match+pose ~ {t_step - t_ext:.3f})")


if __name__ == "__main__":
    main()
