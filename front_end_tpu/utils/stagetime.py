"""Scan-amortized on-chip stage timing — the ONE measurement harness
shared by `bench.py` and `profile_stages.py`.

A standalone jit call on the remote-TPU rig pays a ~1-2 ms
remote-dispatch floor (measured r5: a (8,)-add costs 1.7 ms/call),
which swamps sub-millisecond stages.  Each stage is therefore timed as
ONE dispatch of a `lax.scan` over n iterations whose carry perturbs the
input by ~1e-30 — forcing serial, non-hoistable iterations — and the
per-iteration time is the on-chip stage cost.  Two subtleties both
callers must share (which is why this lives in one module):

- the perturbation touches only the FIRST float leaf (PRNG keys and
  masks stay untouched);
- ONE element of EVERY output leaf feeds the carry — consuming only the
  first leaf lets XLA dead-code-eliminate the stages that don't feed it
  (measured: describe+match "cost" 0.005 ms until the all-leaves tap).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def scan_runner(fn, n: int):
    """A jitted runner executing n serial applications of `fn(*args)`
    in one dispatch; returns the scalar carry (consume it to sync)."""

    @jax.jit
    def run(args):
        def perturb(tree, carry):
            leaves, treedef = jax.tree.flatten(tree)
            done, out = False, []
            for lf in leaves:
                if not done and jnp.issubdtype(lf.dtype, jnp.floating):
                    out.append(lf + carry * 1e-30)
                    done = True
                else:
                    out.append(lf)
            return jax.tree.unflatten(treedef, out)

        def body(carry, _):
            o = fn(*perturb(args, carry))
            tap = sum(jnp.ravel(lf)[0].astype(jnp.float32)
                      for lf in jax.tree.leaves(o))
            return carry + tap * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    return run


def stage_ms(fn, *args, n: int, sync) -> tuple[float, float]:
    """(per-iteration ms, compile seconds) for `fn(*args)`.

    `sync` must prove execution finished via a real device->host fetch
    (`bench._sync` semantics — on this rig `block_until_ready` can
    return while work is still queued)."""
    args = jax.tree.map(jnp.asarray, args)
    run = scan_runner(fn, n)
    t0 = time.perf_counter()
    sync(run(args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(run(args))
    return 1000.0 * (time.perf_counter() - t0) / n, compile_s
