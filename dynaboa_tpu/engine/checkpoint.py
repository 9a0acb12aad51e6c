"""Bit-exact checkpoint / resume for streaming adaptation.

The reference can only *load* its pretrained basemodel — state is never saved
mid-run, so a crashed stream cannot resume (SURVEY §5).  Here the checkpoint
is the full ``AdaptState`` (params, teacher params, Adam moments, history
ring, frame index, rng key), so a stream resumes bit-exactly.

Memory/latency design (round 4, measured on the tunneled TPU):

* The state's ~300 leaves pack ON DEVICE into one flat buffer per dtype
  (a cached jitted concat).  A leaf-by-leaf ``np.asarray`` fetch costs one
  blocking round trip per leaf (~31 ms each) — ~70 s per 434 MB full-model
  checkpoint; packed it is bandwidth-bound (~14 s).
* The flat buffers are fetched and written to disk in ~32 MB slices, so
  the host never materializes the whole checkpoint — in-flight host memory
  is bounded by the slice size, not the state size.  (The previous
  whole-buffer fetch put a ~900 MB transient on this 1-core host per
  checkpoint; under glibc's per-thread arenas the freed high-water was
  retained per worker thread and ratcheted RSS by gigabytes over a
  2500-frame soak.)
* ``AsyncCheckpointer`` runs the fetch+write on ONE persistent worker
  thread (a fresh thread per checkpoint would land each checkpoint's
  allocations in a different glibc arena, multiplying the retained
  high-water) and trims the heap after each write.

On-disk format (v2): one npz with a JSON manifest entry plus one streamed
flat entry per dtype.  ``load_state`` also reads the v1 per-leaf format
(``leaf_%04d`` entries) for old checkpoints.
"""

from __future__ import annotations

import ctypes
import json
import os
import queue
import threading
import zipfile
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from dynaboa_tpu.engine.bilevel import AdaptState

_pack_cache: dict = {}
_SLICE_ELEMS = 8 << 20          # 8M elements per fetched slice (32 MB fp32)


def malloc_trim():
    """Return freed heap pages to the OS (all glibc arenas).

    Long-running loops that allocate ~600 KB frame buffers on worker
    threads and free them on the main thread ratchet the per-thread-arena
    high-water without this — the checkpoint writer and the parallel
    dispatch loop both call it periodically (no-op off glibc)."""
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except OSError:
        pass


_malloc_trim = malloc_trim


def _pack_by_dtype(leaves):
    """Concatenate raveled leaves into one 1-D array per dtype."""
    groups: dict[str, list] = {}
    for leaf in leaves:
        groups.setdefault(str(leaf.dtype), []).append(leaf.ravel())
    return {k: jnp.concatenate(v) if len(v) > 1 else v[0]
            for k, v in groups.items()}


def _pack_state(state: AdaptState):
    """Snapshot the state into per-dtype flat device buffers (one small
    jitted concat).  The returned buffers are independent of the state's own
    buffers, so the caller may keep adapting (donating the live state) while
    these are fetched/written in the background."""
    leaves, _ = jax.tree.flatten(state)
    # non-array leaves (python scalars in opt_state etc.) pass through
    arr_idx = [i for i, l in enumerate(leaves) if hasattr(l, "dtype")]
    arrs = [leaves[i] for i in arr_idx]
    key = tuple((str(a.dtype), a.shape) for a in arrs)
    if key not in _pack_cache:
        _pack_cache[key] = jax.jit(_pack_by_dtype)
    packed = _pack_cache[key](arrs)
    manifest = {
        "version": 2,
        "leaves": [
            ({"kind": "array", "dtype": str(a.dtype),
              "shape": list(np.shape(a))} if hasattr(a, "dtype")
             else {"kind": "py", "value": a})
            for a in leaves],
    }
    return manifest, packed


def _npy_header(dtype: np.dtype, n: int) -> bytes:
    """npy v1 header for a 1-D array of ``n`` items of ``dtype``."""
    import io

    buf = io.BytesIO()
    np.lib.format.write_array_header_1_0(
        buf, {"descr": np.lib.format.dtype_to_descr(np.dtype(dtype)),
              "fortran_order": False, "shape": (n,)})
    return buf.getvalue()


def _fetch_async(x):
    """Start the device->host copy without blocking; np.asarray later."""
    try:
        x.copy_to_host_async()
    except (AttributeError, NotImplementedError):
        pass
    return x


def _write_packed(path: str, manifest: dict, packed: dict) -> None:
    """Stream the packed buffers into an npz, ~32 MB of host memory at a
    time; atomic rename on completion so a crash never leaves a torn file."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
        meta = json.dumps(manifest).encode()
        zf.writestr("meta.json", meta)
        for k, buf in packed.items():
            n = int(buf.shape[0]) if buf.shape else 1
            with zf.open(f"packed_{k}.npy", "w", force_zip64=True) as f:
                f.write(_npy_header(np.dtype(k), n))
                if n <= _SLICE_ELEMS:
                    f.write(np.asarray(buf).tobytes())
                    continue
                # one traced-offset dynamic_slice program per (dtype, n) —
                # literal-offset slices would compile one program per offset
                key = ("slice", k, n, _SLICE_ELEMS)
                if key not in _pack_cache:
                    _pack_cache[key] = jax.jit(
                        lambda b, o, C=_SLICE_ELEMS: jax.lax.dynamic_slice(
                            b, (o,), (C,)))
                slicer = _pack_cache[key]
                handles = deque()
                offs = list(range(0, n, _SLICE_ELEMS))
                for off in offs[:2]:
                    handles.append(_fetch_async(slicer(buf, off)))
                for j, off in enumerate(offs):
                    # overlap: slice j+2's device->host copy was started
                    # before blocking on slice j, so the transfer of the
                    # next windows rides under this one's disk write
                    sl = np.asarray(handles.popleft())
                    if j + 2 < len(offs):
                        handles.append(_fetch_async(slicer(buf, offs[j + 2])))
                    # dynamic_slice CLAMPS the start: the final ragged
                    # window begins at n - C, so the remainder [off, n) is
                    # its TAIL.  (sl[-(n-off):] is the whole window when
                    # the window isn't clamped, since then n - off >= C.)
                    f.write(sl[-(n - off):].tobytes())
                    del sl
    os.replace(tmp, path)
    _malloc_trim()


def save_state(path: str, state: AdaptState) -> None:
    """Serialize the full adaptation state to one (v2, streamed) npz."""
    _write_packed(path, *_pack_state(state))


def _load_v2(zf: zipfile.ZipFile, template: AdaptState) -> AdaptState:
    manifest = json.loads(zf.read("meta.json").decode())
    leaves, treedef = jax.tree.flatten(template)
    if len(manifest["leaves"]) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(manifest['leaves'])} leaves, template "
            f"has {len(leaves)} — structure mismatch")
    packed = {}
    for name in zf.namelist():
        if name.startswith("packed_") and name.endswith(".npy"):
            with zf.open(name) as f:
                packed[name[len("packed_"):-len(".npy")]] = (
                    np.lib.format.read_array(f))
    offs = {k: 0 for k in packed}
    restored = []
    for rec, leaf in zip(manifest["leaves"], leaves):
        if rec["kind"] == "py":
            if hasattr(leaf, "dtype"):
                raise ValueError(
                    "checkpoint recorded a python leaf where the template "
                    f"has a {np.shape(leaf)} array — structure mismatch")
            restored.append(rec["value"])
            continue
        k, shape = rec["dtype"], tuple(rec["shape"])
        if not hasattr(leaf, "dtype"):
            raise ValueError(
                "checkpoint recorded an array where the template has a "
                f"python leaf ({type(leaf).__name__}) — structure mismatch")
        if shape != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint leaf shape {shape} != template "
                f"{np.shape(leaf)}")
        if k != str(leaf.dtype):
            raise ValueError(
                f"checkpoint leaf dtype {k} != template {leaf.dtype} — "
                "a silent cast would break bit-exact resume")
        n = int(np.prod(shape)) if shape else 1
        arr = packed[k][offs[k]:offs[k] + n].reshape(shape)
        offs[k] += n
        restored.append(jnp.asarray(arr, dtype=getattr(leaf, "dtype", None)))
    return jax.tree.unflatten(treedef, restored)


def load_state(path: str, template: AdaptState) -> AdaptState:
    """Restore a checkpoint into the structure of ``template`` (the treedef
    carries the pytree layout; array dtypes/shapes must match).  Reads both
    the streamed v2 format and the legacy per-leaf v1 npz."""
    with zipfile.ZipFile(path) as zf:
        if "meta.json" in zf.namelist():
            out = _load_v2(zf, template)
            # force the host->device uploads to complete BEFORE trimming:
            # the client pins source host buffers until the transfer lands,
            # so an early trim leaves the load's ~434 MB high-water in the
            # heap for the rest of the run
            jax.block_until_ready(out)   # ~10 s of RTTs, once per resume
            _malloc_trim()
            return out
    data = np.load(path)                      # v1: leaf_%04d entries
    leaves, treedef = jax.tree.flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i:04d}"]
        if hasattr(leaf, "dtype") and arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template "
                f"{np.shape(leaf)}")
        restored.append(jnp.asarray(arr, dtype=getattr(leaf, "dtype", None)))
    return jax.tree.unflatten(treedef, restored)


class AsyncCheckpointer:
    """Checkpoint without stalling the dispatch loop.

    ``submit`` snapshots the state on device (a ~ms pack dispatch) and hands
    the streamed fetch+write to ONE persistent worker thread — the transfer
    and file write overlap subsequent adaptation dispatches (numpy releases
    the GIL for the transfer), host in-flight memory stays bounded by the
    slice size, and reusing one thread keeps every checkpoint's allocations
    in the same glibc arena.  At most one write is in flight: a blocking
    submit waits for the previous one (checkpoints are ordered), a
    ``block=False`` submit returns False instead — the graceful-degradation
    path when the writer is slower than the checkpoint cadence (a 434 MB
    checkpoint takes ~14-25 s on the 31 MB/s tunneled TPU; with
    ``checkpoint_every`` producing frames faster than that, a blocking
    submit couples the dispatch loop to checkpoint throughput — the r4
    soak's 22 -> 9.9 fps collapse)."""

    def __init__(self, duty: float = 1.0 / 3.0):
        """``duty``: maximum fraction of wall time spent fetching/writing.
        A full-model checkpoint streams ~434 MB over the same tunnel the
        per-frame dispatches ride; back-to-back writes saturate it and
        drag the dispatch loop ~5x (measured: ~11 fps vs ~50+ unloaded,
        SOAK r5 first run).  After each write the checkpointer refuses
        non-blocking submits for ``duration * (1 - duty) / duty`` — at the
        default 1/3, a 20 s write is followed by a 40 s quiet period.
        ``duty=1.0`` disables the cooldown (tests; fast local disks)."""
        self._q: queue.Queue = queue.Queue()
        self._done = threading.Event()
        self._done.set()
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None
        self._duty = duty
        self._cooldown_until = 0.0
        # why the last non-blocking submit returned False: "busy" (write
        # still in flight) or "cooldown" (idle, duty-cycle bound)
        self.last_refusal: str | None = None

    def _worker(self):
        import time

        while True:
            item = self._q.get()
            if item is None:
                return
            path, manifest, packed = item
            t0 = time.monotonic()
            try:
                _write_packed(path, manifest, packed)
            except BaseException as e:  # noqa: BLE001 — surfaced on wait()
                # Keep the worker alive: a dead thread with a non-None
                # self._thread would make the next submit() enqueue to a
                # queue nobody consumes and the following wait() hang
                # forever.  The failure (ENOSPC, permissions, a dropped
                # tunnel turning a slice fetch into a hard error) is
                # re-raised on the dispatch thread at the next
                # wait()/submit().
                self._error = e
            finally:
                dur = time.monotonic() - t0
                self._cooldown_until = (
                    time.monotonic()
                    + dur * (1.0 - self._duty) / max(self._duty, 1e-6))
                self._done.set()

    @property
    def busy(self) -> bool:
        """True while a write is in flight."""
        return not self._done.is_set()

    def submit(self, path: str, state: AdaptState,
               block: bool = True) -> bool:
        """Queue a checkpoint write.  ``block=False`` refuses (returns
        False) while the previous write is still in flight OR cooling down
        (see ``duty``) instead of stalling the caller; the caller skips
        this interval and retries at the next one with a fresher snapshot
        anyway."""
        import time

        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        if not block:
            # Record WHICH condition refused so the caller's skip log can
            # distinguish "writer still in flight" (writer slower than the
            # cadence) from "idle writer cooling down" (duty-cycle bound,
            # expected with the default duty=1/3) — they call for opposite
            # operator responses.
            if self.busy:
                self.last_refusal = "busy"
                return False
            if time.monotonic() < self._cooldown_until:
                self.last_refusal = "cooldown"
                return False
        self.wait()
        manifest, packed = _pack_state(state)
        self._done.clear()
        self._q.put((path, manifest, packed))
        return True

    def wait(self) -> None:
        self._done.wait()
        if self._error is not None:
            e, self._error = self._error, None
            raise RuntimeError(f"async checkpoint write failed: {e!r}") from e

    def close(self) -> None:
        """Join the worker after the in-flight write completes.  Without
        this every checkpointer leaks one idle daemon thread (pinning its
        glibc arena); a later submit() restarts the worker, so close() is
        safe to call between runs.  Does not raise on a pending write
        failure — call wait() first if the error matters."""
        if self._thread is None:
            return
        self._done.wait()
        self._q.put(None)
        self._thread.join()
        self._thread = None
        self._error = None
