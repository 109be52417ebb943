"""Frame sinks: sync/async PNG and video writers (the host-side output farm).

Capability parity with the reference's output pipeline (``utils.py:380-520``):
``ImageWriter``/``AsyncImageWriter`` (PNG, 4-thread pool) and
``VideoWriter``/``AsyncVideoWriter`` (AVI). Differences, all deliberate:

* Frames are top-down numpy arrays end to end; no vertical un-flip is needed at
  write time (the reference un-flips because GL frames are bottom-up —
  ``utils.py:366,377``).
* Video encoding is the dependency-free :class:`depthrenderer_tpu.video.AviFile`
  (MJPG or raw DIB) instead of cv2.VideoWriter.
* The async video writer keeps the reference's single-worker pool — frames must hit
  the container in order (``utils.py:501-503``) — but uses an explicit work queue
  with backpressure so a slow disk cannot grow memory unboundedly.
"""

from __future__ import annotations

import os
import queue
import threading
from multiprocessing.pool import ThreadPool

import numpy as np

from .io import save_image
from .video import AviFile


def _to_host_uint8(frame):
    frame = np.asarray(frame)
    if frame.dtype != np.uint8:
        frame = np.clip(np.round(frame), 0, 255).astype(np.uint8)
    return frame


class ImageWriter:
    """Synchronous PNG writer (reference: ``utils.py:380-406``)."""

    def write(self, frame, path, file_format="PNG"):
        self._worker(frame, path, file_format)

    @staticmethod
    def _worker(frame, path, file_format):
        save_image(_to_host_uint8(frame), path, file_format)

    def cleanup(self):
        pass


class AsyncImageWriter(ImageWriter):
    """PNG writer on a thread pool (reference: ``utils.py:409-437``)."""

    def __init__(self, num_workers=4):
        super().__init__()
        self.pool = ThreadPool(processes=num_workers)
        self._results = []

    def write(self, frame, path, file_format="PNG"):
        # Copy so callers may reuse/donate the buffer immediately.
        frame = _to_host_uint8(frame).copy()
        self._results.append(self.pool.apply_async(self._worker, (frame, path, file_format)))

    def cleanup(self):
        """Finish writing any queued frames and release the pool."""
        self.pool.close()
        self.pool.join()
        for r in self._results:
            r.get()  # surface worker exceptions
        self._results.clear()


class VideoWriter:
    """Synchronous video writer (reference: ``utils.py:440-484``).

    Writes AVI natively (MJPG/DIB, no dependencies). A path ending in ``.mp4``
    requests MP4 (BASELINE config #5): frames stream to a temporary AVI and
    ``cleanup()`` converts it — H.264 via ffmpeg when available (reference
    counterpart: ``render_many.py:76`` libx264), otherwise a native MJPEG
    remux (:class:`depthrenderer_tpu.video.Mp4File`, byte-identical payloads,
    no dependencies). If conversion itself fails the AVI is kept (and ``path``
    updated) with a warning.
    """

    def __init__(self, path, size, fps=24, codec="MJPG", quality=92):
        self.path = str(path)
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        self._mp4_target = None
        write_path = self.path
        if self.path.lower().endswith(".mp4"):
            self._mp4_target = self.path
            write_path = self.path[:-4] + ".tmp.avi"
        self._avi_path = write_path
        self.writer = AviFile(write_path, size, fps=fps, codec=codec, quality=quality)

    def write(self, frame):
        self.writer.write(_to_host_uint8(frame))

    def write_yuv420(self, y, cb, cr):
        """Append a frame given as planar YUV 4:2:0 (see AviFile.write_yuv420)."""
        self.writer.write_yuv420(y, cb, cr)

    def cleanup(self):
        if self.writer:
            self.writer.close()
        if self._mp4_target:
            from .utils import log
            from .video import convert_to_mp4

            try:
                convert_to_mp4(self._avi_path, self._mp4_target)
            except Exception as e:
                fallback = self._mp4_target[:-4] + ".avi"
                os.replace(self._avi_path, fallback)
                self.path = fallback
                log(f"MP4 conversion failed ({e}): kept AVI output at "
                    f"{fallback} instead of {self._mp4_target}")
            self._mp4_target = None


class AsyncVideoWriter(VideoWriter):
    """AVI writer fed by a single encoder thread (reference: ``utils.py:487-520``).

    One worker (frame order matters); a bounded queue provides backpressure.
    """

    def __init__(self, path, size, fps=24, codec="MJPG", quality=92, max_queue=64):
        super().__init__(path, size, fps=fps, codec=codec, quality=quality)
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._error = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            frame = self._queue.get()
            if frame is None:
                return
            try:
                if isinstance(frame, tuple) and frame[0] == "yuv420":
                    self.writer.write_yuv420(*frame[1:])
                else:
                    self.writer.write(frame)
            except Exception as e:  # surfaced on cleanup
                self._error = e

    def write(self, frame):
        if self._error:
            raise self._error
        self._queue.put(_to_host_uint8(frame).copy())

    def write_yuv420(self, y, cb, cr):
        if self._error:
            raise self._error
        self._queue.put(("yuv420", np.asarray(y, np.uint8).copy(),
                         np.asarray(cb, np.uint8).copy(),
                         np.asarray(cr, np.uint8).copy()))

    def cleanup(self):
        self._queue.put(None)
        self._thread.join()
        super().cleanup()
        if self._error:
            raise self._error
