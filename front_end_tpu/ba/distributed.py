"""Distributed windowed BA: landmarks sharded over a device mesh.

The multi-chip design promised by SURVEY §7.7: landmark blocks live on
different devices; each device linearizes ITS landmarks' factors and
reduces a partial reduced-camera-system (S, rhs) — the only globally
coupled quantity, of size 6W×6W — with `psum` over the `landmark` mesh
axis (ICI collectives emitted by shard_map).  The tiny damped solve is
replicated on every device; landmark back-substitution never leaves the
shard.  This replaces g2o+CHOLMOD (`sba_node.cpp:84-100`) with a
communication volume per LM iteration of O(W²) — independent of L.

Works identically on a real TPU slice or the 8-device virtual CPU mesh
used by the tests and the driver's dryrun.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from front_end_tpu.ba import factors, schur
from front_end_tpu.geometry.camera import StereoRig
from front_end_tpu.utils.precision import f32_precision

AXIS = "landmark"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (AXIS,))


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> Mesh:
    """Real multi-host entry: start the JAX distributed runtime and
    return the global landmark mesh spanning every host's devices.

    On TPU pods the arguments are auto-detected from the environment
    (call with no args); elsewhere pass coordinator/num_processes/
    process_id explicitly.  The landmark axis then spans hosts: shard_map
    collectives ride ICI within a slice and DCN across slices — the
    TPU-native replacement for the reference's ROS graph as its only
    distribution mechanism (SURVEY §5 'Distributed communication
    backend').  Every process runs the same `ba_solve_sharded` call on
    its addressable shard of the landmark arrays.
    """
    # NB: do NOT probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize() refuses to run.
    if not jax.distributed.is_initialized():
        kw = {}
        if coordinator_address is not None:
            kw = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
        jax.distributed.initialize(**kw)
    return make_mesh()


def _local_cost(poses, X, meas, vis_w, rig, huber_px):
    r = factors.residual(poses[None, :], X[:, None, :], meas, rig)
    r2 = jnp.sum(r * r, -1)
    return jnp.sum(factors.robust_cost(r2, huber_px) * vis_w)


def _sharded_body(poses0, X0, meas, vis_w, rig, *, huber_px, lam0, iters):
    """Runs on each shard; X0/meas/vis_w are the LOCAL landmark blocks.

    Mirrors `schur.ba_solve`'s one-linearization-per-iteration LM: the
    last ACCEPTED state's psum-reduced camera system rides in the carry.
    Each iteration needs exactly TWO fused all-reduces, sequentially
    dependent so they cannot merge: (1) the carried state's packed
    (S_off | landmark-rhs-term) at the fresh damping — the solve's input;
    (2) the tentative state's packed (Hpp | bp | cost) — the accept
    decision's input, which depends on the step from (1).  See
    `comm_audit` for the exact per-iteration float/byte count; at W=3
    it is 469 floats (1876 B), so collective latency, not volume,
    dominates at small windows — which is why each of the two is a
    single fused vector rather than per-block psums."""
    psum = partial(jax.lax.psum, axis_name=AXIS)

    def local_ne_packed(poses, X):
        Hpp_p, Hpl, Hll, bp_p, bl, cost_p = schur._normal_equations(
            poses, X, meas, vis_w, rig, huber_px)
        packed = psum(jnp.concatenate(
            [Hpp_p.ravel(), bp_p.ravel(), cost_p[None]]))
        W = Hpp_p.shape[0]
        Hpp = packed[:36 * W].reshape(W, 6, 6)
        bp = packed[36 * W:42 * W].reshape(W, 6)
        cost = packed[42 * W]
        return (Hpp, Hpl, Hll, bp, bl), cost

    ne0, cost0 = local_ne_packed(poses0, X0)

    def step(carry, _):
        poses, X, lam, cost, ne = carry
        Hpp, Hpl, Hll, bp, bl = ne
        S_off_p, rhs_p, Hll_inv = schur._schur_reduce(
            Hpp, Hpl, Hll, bp, bl, lam)
        # S_off/rhs are built from the LOCAL landmark blocks and must be
        # reduced; Hpp/bp in the carry are already global.  NB the
        # global bp is re-reduced inside rhs_p's formula via bl, so pass
        # the local contribution convention: rhs_p = bp_local? No — bp
        # here is global and identical on every shard, so rhs_p =
        # bp_global - psum(HplHinv·bl_local) requires subtracting the
        # duplicated bp (n-1) times; instead reduce only the landmark
        # term.
        W = Hpp.shape[0]
        lm_term = bp - rhs_p                     # = HplHinv·bl (local)
        packed = psum(jnp.concatenate(
            [S_off_p.ravel(), lm_term.ravel()]))
        S_off = packed[:36 * W * W].reshape(W, W, 6, 6)
        rhs = bp - packed[36 * W * W:].reshape(W, 6)
        dxi = schur._assemble_and_solve(Hpp, S_off, rhs, lam)
        dX = schur._back_substitute(Hll_inv, bl, Hpl, dxi)
        new_poses, new_X = schur._apply(poses, X, dxi, dX)
        new_ne, new_cost = local_ne_packed(new_poses, new_X)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        X = jnp.where(accept, new_X, X)
        cost = jnp.where(accept, new_cost, cost)
        ne = jax.tree.map(lambda a, b: jnp.where(accept, a, b), new_ne, ne)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-9, 1e8)
        return (poses, X, lam, cost, ne), None

    (poses, X, _, cost, _), _ = jax.lax.scan(
        step, (poses0, X0, jnp.asarray(lam0), cost0, ne0), None,
        length=iters)

    r = factors.residual(poses[None, :], X[:, None, :], meas, rig)
    r2 = jnp.sum(r * r, -1) * vis_w
    rms = jnp.sqrt(psum(jnp.sum(r2))
                   / jnp.maximum(psum(jnp.sum(vis_w)) * 4.0, 1.0))
    return poses, X, cost, cost0, rms


# Compiled-executable cache: building a fresh shard_map lambda per call
# defeated jax's trace cache and every solve paid a multi-second
# recompile (which also swamped any scaling measurement).  Keyed on the
# mesh + static solver params + input shapes; the rig rides through as a
# replicated pytree argument so differently-calibrated rigs share one
# executable.
_SHARDED_CACHE: dict = {}


def _build_sharded_fn(mesh: Mesh, iters: int, huber_px: float,
                      lam0: float):
    body = partial(_sharded_body, huber_px=huber_px, lam0=lam0,
                   iters=iters)
    smapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P(AXIS), P(), P(), P()),
        check_vma=False)
    return jax.jit(f32_precision(smapped))


def ba_solve_sharded(mesh: Mesh, poses0, X0, meas, vis, rig: StereoRig, *,
                     iters: int = 12, huber_px: float = 3.0,
                     lam0: float = 1e-4) -> schur.BAResult:
    """Landmark-sharded BA over `mesh` (1-D, axis 'landmark').

    L must be divisible by the mesh size (pad with vis=0 rows otherwise —
    masked rows contribute zero to every reduction).
    """
    vis_w = jnp.asarray(vis, jnp.float32)

    key = (mesh, iters, float(huber_px), float(lam0))
    fn = _SHARDED_CACHE.get(key)
    if fn is None:
        fn = _SHARDED_CACHE[key] = _build_sharded_fn(
            mesh, iters, float(huber_px), float(lam0))
    poses, X, cost, cost0, rms = fn(jnp.asarray(poses0), jnp.asarray(X0),
                                    jnp.asarray(meas), vis_w, rig)
    return schur.BAResult(poses=poses, landmarks=X, cost=cost, cost0=cost0,
                          rms_px=rms)


def comm_audit(W: int, iters: int) -> dict:
    """STATIC per-solve communication audit of `_sharded_body`.

    Counted from the code, not measured: `local_ne_packed` psums
    36W + 6W + 1 floats (Hpp | bp | cost); the in-step Schur psum moves
    36W² + 6W floats (S_off | landmark rhs term).  One NE psum runs
    before the scan; each of the `iters` scan steps runs one Schur psum
    and one NE psum (sequentially dependent — the tentative state that
    the NE psum scores is built FROM the Schur psum's solve, so they
    cannot fuse).  The dryrun asserts the jaxpr's actual collective
    count against this so a regression to per-block psums fails loudly.
    """
    ne = 36 * W + 6 * W + 1
    schur_ = 36 * W * W + 6 * W
    per_iter = ne + schur_
    return {
        "psums_per_iter": 2,
        "floats_per_iter": per_iter,
        "bytes_per_iter": 4 * per_iter,
        "psums_per_solve": 1 + 2 * iters,
        "bytes_per_solve": 4 * (ne + iters * per_iter),
    }


def count_collectives(fn, *args) -> int:
    """Count all-reduce-family collective EXECUTIONS in `fn`'s jaxpr:
    walks sub-jaxprs and multiplies `scan` bodies by their trip count,
    so the result is collectives per call — the mechanical check behind
    the comm audit."""
    names = {"psum", "all_reduce", "psum2", "all_gather",
             "reduce_scatter", "ppermute", "all_to_all"}

    def walk(jaxpr) -> int:
        n = 0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name in names:
                n += 1
            mult = (eqn.params.get("length", 1)
                    if eqn.primitive.name == "scan" else 1)
            for v in eqn.params.values():
                for sub in _subjaxprs(v):
                    n += mult * walk(sub)
        return n

    def _subjaxprs(v):
        # ClosedJaxpr/Jaxpr moved across jax versions; duck-type them
        if hasattr(v, "jaxpr"):
            yield v.jaxpr
        elif hasattr(v, "eqns"):
            yield v
        elif isinstance(v, (tuple, list)):
            for x in v:
                yield from _subjaxprs(x)

    return walk(jax.make_jaxpr(fn)(*args).jaxpr)


def ba_solve_sharded_inline(mesh: Mesh, poses0, X0, meas, vis_w,
                            rig: StereoRig, *, iters: int = 12,
                            huber_px: float = 3.0,
                            lam0: float = 1e-4) -> schur.BAResult:
    """Landmark-sharded BA usable INSIDE an enclosing jit — the live
    windowed pipeline's BA stage (`window/tracker.py:run_window_ba` with
    a mesh).  Unlike `ba_solve_sharded` it neither jits nor caches: the
    enclosing traced step (e.g. `window_vo_step`) owns compilation, and
    shard_map composes with the surrounding program so XLA overlaps the
    psums with neighbouring work.  L must be divisible by the mesh's
    '{AXIS}' axis size."""
    body = partial(_sharded_body, huber_px=float(huber_px),
                   lam0=float(lam0), iters=int(iters))
    spec_l = P(AXIS)
    smapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), spec_l, spec_l, spec_l, P()),
        out_specs=(P(), spec_l, P(), P(), P()),
        check_vma=False)
    poses, X, cost, cost0, rms = smapped(
        jnp.asarray(poses0), jnp.asarray(X0), jnp.asarray(meas),
        jnp.asarray(vis_w, jnp.float32), rig)
    return schur.BAResult(poses=poses, landmarks=X, cost=cost,
                          cost0=cost0, rms_px=rms)


def pad_landmarks(X0, meas, vis, n_devices: int):
    """Pad the landmark dimension to a multiple of the mesh size."""
    L = X0.shape[0]
    Lp = -(-L // n_devices) * n_devices
    pad = Lp - L
    if pad == 0:
        return X0, meas, vis
    X0 = jnp.pad(X0, ((0, pad), (0, 0)))
    meas = jnp.pad(meas, ((0, pad), (0, 0), (0, 0)))
    vis = jnp.pad(vis, ((0, pad), (0, 0)))
    return X0, meas, vis
