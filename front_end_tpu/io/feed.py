"""Asynchronous device feed — the host I/O layer.

Replaces the reference's concurrency plumbing around image delivery: ROS
topic queues with mutex/condvar buffers (`live_stereo.cpp:162-269`,
`StereoCamera.cpp:43-140`) and the vidDebug 150-slot ring buffer with a
dedicated writer thread (`vidDebug/buffer.cpp:20-120`).

`DeviceFeed` prefetches decoded frames from any iterator onto the device
on a background thread (bounded ring), so `vo_step` never stalls on
host decode or the PCIe/tunnel link — the double-buffering pattern of
SURVEY §2.5.  A native C++ ring-buffer file reader can be plugged in as
the upstream iterator (see `native/`).
"""
from __future__ import annotations

import queue
import threading

import jax
import jax.numpy as jnp


class DeviceFeed:
    """Iterate (left, right) numpy frames -> device arrays, prefetched.

    depth: ring size (frames in flight).  The reference's ring held 150
    raw frames for disk capture; for compute feeding 2-4 is enough to
    hide host latency.
    """

    def __init__(self, frame_iter, depth: int = 3, device=None,
                 dtype=None, threaded: bool | None = None):
        """dtype: optional transfer dtype.  Default keeps the source dtype
        — ship uint8 camera frames as uint8 (4x fewer bytes over the
        host->device link) and cast to float32 on device as stage 0 of
        the jitted step (`vo_step` does this already).

        threaded: background-thread transfers (the double-buffering
        design).  Default: ON for local devices, OFF for the remote
        (axon-tunnelled) TPU, where a transfer thread contending with
        the dispatching thread collapses throughput ~25x (measured 36 ->
        1.4 fps) — there the puts run inline on the consumer thread and
        the upstream decode ring still overlaps disk/decode."""
        self._q = queue.Queue(maxsize=depth)
        self._device = device or jax.devices()[0]
        self._dtype = dtype
        self._err = None
        if threaded is None:
            # `device` may be a Sharding (e.g. replicated over a mesh
            # for the sharded-BA live mode) — probe one of its devices
            dev0 = self._device
            if hasattr(dev0, "device_set"):
                dev0 = next(iter(dev0.device_set))
            ver = getattr(getattr(dev0, "client", None),
                          "platform_version", "") or ""
            threaded = "axon" not in ver.lower()
        self._threaded = threaded
        if threaded:
            self._thread = threading.Thread(
                target=self._worker, args=(iter(frame_iter),), daemon=True)
            self._thread.start()
        else:
            self._it = iter(frame_iter)

    def _worker(self, it):
        try:
            for l, r in it:
                if self._dtype is not None:
                    l = jnp.asarray(l, self._dtype)
                    r = jnp.asarray(r, self._dtype)
                ld = jax.device_put(l, self._device)
                rd = jax.device_put(r, self._device)
                self._q.put((ld, rd))
        except Exception as e:          # surfaced on next __next__
            self._err = e
        finally:
            self._q.put(None)

    def _put(self, l, r):
        if self._dtype is not None:
            l = jnp.asarray(l, self._dtype)
            r = jnp.asarray(r, self._dtype)
        return (jax.device_put(l, self._device),
                jax.device_put(r, self._device))

    def __iter__(self):
        return self

    def __next__(self):
        if not self._threaded:
            l, r = next(self._it)
            return self._put(l, r)
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
