"""Decoded-canvas cache: pay JPEG decode once, stream uint8 canvases after.

The host decodes images to a FIXED uint8 canvas and all randomness
(RandomResizedCrop, jitter, ...) runs on device (``ops/augment.py``), so the
canvas for a given source file is deterministic — caching it is lossless for
training semantics. That turns every epoch after the first from
decode-bound (~8 ms/image/core for Pixiv-scale JPEGs) into a sequential
memmap read (~0.2 MB/image), which one host core sustains far beyond the
device rate.

Layout under ``<dataset>/.tic_canvas_cache/``: per canvas size a raw uint8
memmap ``<h>x<w>.data`` of shape (N, h, w, 3), a ``.done`` byte map marking
which slots hold decoded pixels (the cache fills lazily while epoch 1
iterates), and a ``.json`` carrying a dataset fingerprint (file names +
sizes) that invalidates the cache when the dataset changes.

Space: ~N * h * w * 3 bytes (the reference's 132k-image corpus at 256² is
~26 GB) — a deliberate disk-for-decode trade, off by default
(``TrainConfig.canvas_cache``).
"""
from __future__ import annotations

import atexit
import glob
import hashlib
import json
import os
import threading
import weakref

import numpy as np

from .folder import ImageFolderIndex


def _fingerprint(index: ImageFolderIndex) -> str:
    h = hashlib.sha1()
    root = index.root
    for p in index.paths:
        try:
            st = os.stat(p)
            size, mtime = st.st_size, st.st_mtime_ns
        except OSError:
            size, mtime = -1, -1
        # mtime is part of the identity: a file replaced in-place by a
        # same-size re-encode must invalidate its cached canvas
        h.update(f"{os.path.relpath(p, root)}:{size}:{mtime}\n".encode())
    return h.hexdigest()


# Bumped when decode output changes for identical inputs (IDCT method,
# upsampling, resize kernel): cached canvases from an older decoder must
# not serve as hits for the new one.
DECODER_VERSION = "islow-fancy-1"


# One process-wide atexit hook over a weak set of live caches: registering
# a bound method per instance would pin every CanvasCache (and its memmaps)
# alive for the process lifetime.
_LIVE_CACHES: "weakref.WeakSet[CanvasCache]" = weakref.WeakSet()
_ATEXIT_INSTALLED = False
# instance-unique marker suffix within one process; lock-guarded so two
# caches constructed from different threads (train + val loaders) can
# never share a marker path
_MARKER_SEQ = 0
_MARKER_LOCK = threading.Lock()


def _clean_live_caches() -> None:
    for cache in list(_LIVE_CACHES):
        cache._mark_clean()


def _register_cache(cache: "CanvasCache") -> None:
    global _ATEXIT_INSTALLED
    _LIVE_CACHES.add(cache)
    if not _ATEXIT_INSTALLED:
        atexit.register(_clean_live_caches)
        _ATEXIT_INSTALLED = True


def _finalize_clean(data: np.memmap, done: np.memmap, marker: str) -> None:
    """Flush + remove THIS instance's marker. Module-level (not a bound
    method) so the ``weakref.finalize`` below never pins the cache alive."""
    try:
        data.flush()
        done.flush()
        os.remove(marker)
    except (OSError, ValueError):
        pass


def find_existing_canvas(index: ImageFolderIndex,
                         min_size: tuple[int, int] | None = None,
                         cache_dir: str | None = None,
                         with_fingerprint: bool = False):
    """Canvas size of a VALID existing cache for ``index``, or None.

    ``with_fingerprint=True`` returns ``(canvas_or_None, fingerprint)`` so a
    caller constructing a CanvasCache right after the probe can hand the
    fingerprint over instead of re-statting the whole dataset; the
    fingerprint is ``None`` when no cache dir exists (the probe statted
    nothing — ``CanvasCache(fingerprint=None)`` computes its own).

    Single source of truth for the meta-validity predicate (fingerprint,
    entry count, decoder version, .data present) that ``CanvasCache``'s
    constructor applies — callers probing for a reusable cache (the judge's
    ``canvas_cache='auto'``) must not duplicate-and-drift it. ``min_size``
    filters out canvases SMALLER than the consumer's input (feeding a
    model from an upscaled canvas would silently change predictions);
    among sufficient ones the smallest is preferred (exact match first) —
    fewer bytes per batch on transfer-bound paths.
    """
    root = cache_dir or os.path.join(index.root, ".tic_canvas_cache")
    if not os.path.isdir(root):
        # no cache dir -> nothing was statted, so there is no fingerprint to
        # hand over: return None and let a caller that actually constructs a
        # CanvasCache pay the (single) stat sweep there. Computing it here
        # would bill every cache-less judge startup one full-corpus sweep
        # for a value the common 'auto' path immediately discards.
        return (None, None) if with_fingerprint else None
    fp = _fingerprint(index)
    candidates: list[tuple[int, int]] = []
    for meta_path in sorted(glob.glob(os.path.join(root, "*.json"))):
        try:
            with open(meta_path) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            continue
        if (meta.get("fingerprint") == fp and meta.get("n") == len(index)
                and meta.get("decoder") == DECODER_VERSION
                and os.path.exists(meta_path[:-5] + ".data")):
            canvas = tuple(int(c) for c in meta.get("canvas", ()))
            if len(canvas) == 2:
                candidates.append(canvas)
    if min_size is not None:
        candidates = [c for c in candidates
                      if c[0] >= min_size[0] and c[1] >= min_size[1]]
        if tuple(min_size) in candidates:
            candidates = [tuple(min_size)]
    best = min(candidates, key=lambda c: c[0] * c[1]) if candidates else None
    return (best, fp) if with_fingerprint else best


class CanvasCache:
    def __init__(self, index: ImageFolderIndex, canvas: tuple[int, int],
                 cache_dir: str | None = None,
                 fingerprint: str | None = None):
        """``fingerprint``: pass the value a just-run ``find_existing_canvas``
        probe computed to skip re-statting every dataset file (the sweep is
        ~2 os.stat per image; the judge startup on a 132k-image corpus would
        otherwise pay it twice)."""
        self.canvas = (int(canvas[0]), int(canvas[1]))
        n = len(index)
        root = cache_dir or os.path.join(index.root, ".tic_canvas_cache")
        os.makedirs(root, exist_ok=True)
        tag = f"{self.canvas[0]}x{self.canvas[1]}"
        self._data_path = os.path.join(root, f"{tag}.data")
        self._done_path = os.path.join(root, f"{tag}.done")
        self._dirty_path = os.path.join(root, f"{tag}.dirty")
        meta_path = os.path.join(root, f"{tag}.json")

        fp = fingerprint or _fingerprint(index)
        meta = None
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    meta = json.load(f)
            except (OSError, ValueError):
                meta = None
        if (meta is None or meta.get("fingerprint") != fp
                or meta.get("n") != n
                or meta.get("decoder") != DECODER_VERSION):
            for p in (self._data_path, self._done_path):
                if os.path.exists(p):
                    os.remove(p)
            with open(meta_path, "w") as f:
                json.dump({"fingerprint": fp, "n": n,
                           "canvas": list(self.canvas),
                           "decoder": DECODER_VERSION}, f)

        # free-space guard AFTER invalidation: a stale cache being rebuilt
        # (dataset grew, decoder bumped) re-enters the create path with the
        # old file's bytes just reclaimed, so `have` must be re-evaluated
        # here, not before the invalidation block
        need_bytes = n * self.canvas[0] * self.canvas[1] * 3
        if not os.path.exists(self._data_path):
            st = os.statvfs(root)
            free = st.f_bavail * st.f_frsize
            if free < need_bytes * 1.05:
                # np.memmap would happily create a sparse file and the
                # process would later die with an uncatchable SIGBUS when
                # the filesystem can't back a written page
                raise RuntimeError(
                    f"canvas cache needs ~{need_bytes / 1e9:.1f} GB but only "
                    f"{free / 1e9:.1f} GB free under {root}; freeing space "
                    "or disabling TrainConfig.canvas_cache avoids a mid-"
                    "epoch SIGBUS"
                )

        shape = (n, *self.canvas, 3)
        data_fresh = not os.path.exists(self._data_path)
        self.data = np.memmap(self._data_path, dtype=np.uint8,
                              mode="w+" if data_fresh else "r+", shape=shape)
        mode = "r+" if os.path.exists(self._done_path) else "w+"
        self.done = np.memmap(self._done_path, dtype=np.uint8, mode=mode,
                              shape=(n,))
        # _crashed_dirty() must run UNCONDITIONALLY (not short-circuited by
        # data_fresh): it also CONSUMES stale markers from dead writers. A
        # marker that survives a fresh full rebuild would make the NEXT
        # process treat the now-valid cache as crash-dirty and re-decode the
        # whole corpus.
        crashed = self._crashed_dirty()
        if data_fresh or crashed:
            # data_fresh: a surviving done-map without its data file (e.g.
            # the ~26 GB .data deleted to reclaim disk) must not mark the
            # zero-filled fresh data as hits. crashed_dirty: a writer died
            # mid-fill and the kernel may have written back the small hot
            # done page before the canvas pages it flags — done=1 slots
            # could front unwritten (zero) pixels, so refill from scratch.
            self.done[:] = 0
        # dirty-marking is LAZY (first store()): a read-only consumer of a
        # warm cache (a 100%-hit judge pass) must not hold a marker whose
        # survival after a SIGKILL would make the next reader discard and
        # refill a perfectly valid multi-GB cache. Crashing before any
        # store is safe markerless — the done map only flags slots whose
        # pixels a PREVIOUS clean writer made durable.
        self._clean = True
        self._own_dirty_path: str | None = None
        self._finalizer = None

    def _crashed_dirty(self) -> bool:
        """True if ANY past writer of this cache died mid-fill.

        Markers are per-instance files (``<tag>.dirty.<pid>.<seq>``) so
        concurrent writers never clobber each other's marker, and one
        writer's clean exit cannot erase another's in-progress marker (the
        multi-process holes of the original single-file protocol). Stale
        markers from dead writers are consumed (removed) here, after which
        the caller refills the done-map from scratch. Markers from older
        versions — ``<tag>.dirty.<pid>`` and the single-file ``<tag>.dirty``
        (pid in content) — are honored the same way.
        """
        crashed = False
        pattern = glob.glob(self._dirty_path + ".*") + (
            [self._dirty_path] if os.path.exists(self._dirty_path) else []
        )
        for path in pattern:
            suffix = path[len(self._dirty_path):]
            if suffix.startswith("."):
                try:
                    pid = int(suffix[1:].split(".")[0])
                except ValueError:
                    crashed = True
                    self._remove_quiet(path)
                    continue
            else:  # legacy single-file marker: pid stored in the content
                try:
                    with open(path) as f:
                        pid = int(f.read().strip() or "0")
                except (OSError, ValueError):
                    crashed = True
                    self._remove_quiet(path)
                    continue
            if pid == os.getpid():
                continue  # another loader in THIS live process
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                crashed = True  # writer died without a clean shutdown
                self._remove_quiet(path)
            except PermissionError:
                pass  # pid exists (owned by someone else): writer alive
        return crashed

    @staticmethod
    def _remove_quiet(path: str) -> None:
        try:
            os.remove(path)
        except OSError:
            pass

    def _mark_dirty(self) -> None:
        global _MARKER_SEQ
        with _MARKER_LOCK:
            _MARKER_SEQ += 1
            seq = _MARKER_SEQ
        # pid first (what _crashed_dirty liveness-checks), then a per-
        # instance sequence so two caches in ONE process never share a
        # marker (the first to clean up must not unmark the second)
        self._own_dirty_path = f"{self._dirty_path}.{os.getpid()}.{seq}"
        with open(self._own_dirty_path, "w") as f:
            f.write("")
        _register_cache(self)
        # also clean on garbage collection: a cache whose last reference
        # dies before process exit (e.g. full_judge's local) silently
        # leaves the WeakSet — without this finalizer its marker would
        # survive the clean run and make the NEXT process treat the cache
        # as crash-dirty and refill it from scratch
        self._finalizer = weakref.finalize(
            self, _finalize_clean, self.data, self.done, self._own_dirty_path)

    def _mark_clean(self) -> None:
        # flush canvases BEFORE removing the dirty marker so the marker's
        # absence really does imply the data pages are durable; only THIS
        # instance's marker is removed — other live writers stay dirty
        try:
            self.data.flush()
            self.done.flush()
            if self._own_dirty_path:
                self._remove_quiet(self._own_dirty_path)
        except (OSError, ValueError):
            pass

    def flush(self) -> None:
        """Durably flush canvases and drop this instance's dirty marker.

        Call when a fill pass completes successfully; until the next
        ``store`` (which re-marks dirty) the cache reads as clean to other
        processes even while this one stays alive. The GC/exit finalizer
        covers callers that never reach a clean point."""
        self._mark_clean()
        self._clean = True

    def hit_rate(self) -> float:
        return float(np.mean(self.done != 0))

    def fetch(self, ids: np.ndarray, out: np.ndarray) -> np.ndarray:
        """Copy cached canvases for ``ids`` into ``out`` rows; returns the
        boolean hit mask (False rows still need decoding)."""
        hit = self.done[ids] != 0
        if hit.any():
            out[np.nonzero(hit)[0]] = self.data[ids[hit]]
        return hit

    def store(self, ids: np.ndarray, images: np.ndarray) -> None:
        if len(ids) == 0:
            return
        if self._clean:
            # dirty marker BEFORE the first write (construction is lazy —
            # read-only consumers never mark) and before any write after a
            # flush(), so a crash mid-write is always detectable
            self._clean = False
            if self._finalizer is not None:
                self._finalizer.detach()
            self._mark_dirty()
        self.data[ids] = images
        self.done[ids] = 1
