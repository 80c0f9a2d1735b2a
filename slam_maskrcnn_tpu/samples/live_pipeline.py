"""End-to-end streaming pipeline: Mask R-CNN -> semantic TSDF -> render.

The full system (BASELINE gate config 5): per frame, run instance
segmentation on the RGB image, post-process to a label-encoded mask
(dmask semantics), fuse into the TSDF with instance association, and
optionally render. The reference splits this into two offline stages
joined by mask PNGs on disk (SURVEY §1); here the same contract runs live,
with a background host thread prefetching/decoding frames while the device
works (replacing the reference's synchronous imread loop,
kernel.cpp:64-100).
"""

from __future__ import annotations

import queue
import threading
import time

import numpy as np


class FramePrefetcher:
    """Host-side decode thread: keeps `depth` frames decoded ahead."""

    def __init__(self, seq, depth: int = 4):
        self.seq = seq
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        for i in range(len(self.seq)):
            self.q.put(self.seq[i])
        self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item


class LivePipeline:
    """detect -> label-encode -> fuse (+ render every `render_every`)."""

    def __init__(self, model, intrinsic, fusion_cfg=None,
                 backend: str = "pallas", use_depth_filter: bool = True,
                 render_every: int = 0, render_size=None):
        from slam_maskrcnn_tpu.fusion import FusionConfig, SemanticFusion

        self.model = model
        self.fusion = SemanticFusion(intrinsic,
                                     fusion_cfg or FusionConfig(),
                                     backend=backend)
        self.use_depth_filter = use_depth_filter
        self.render_every = render_every
        self.render_size = render_size
        self.frames_done = 0
        self.renders = []
        self.timings = {"detect": 0.0, "fuse": 0.0, "render": 0.0}
        self._viewer = None  # constructed once on first render

    def step(self, depth: np.ndarray, color_bgr: np.ndarray,
             extrinsic: np.ndarray, mean_depth: float | None = None):
        from slam_maskrcnn_tpu.models.mask_ops import (mask_detect,
                                                       mask_detect_device)

        t0 = time.perf_counter()
        rgb = np.ascontiguousarray(color_bgr[:, :, ::-1])
        if self.use_depth_filter:
            # depth filtering needs per-mask medians -> host dmask path
            mask = mask_detect(self.model, rgb, depth)
        else:
            # device-side label encode: only [H, W] u8 crosses back
            mask = mask_detect_device(self.model, rgb)
        self.timings["detect"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        out = self.fusion.parse_frame(depth, color_bgr, mask, extrinsic,
                                      mean_depth)
        self.timings["fuse"] += time.perf_counter() - t0
        self.frames_done += 1

        if (self.render_every and out is not None
                and self.frames_done % self.render_every == 0):
            t0 = time.perf_counter()
            if self._viewer is None:
                from slam_maskrcnn_tpu.viz.viewer import Viewer

                H, W = self.render_size or depth.shape
                self._viewer = Viewer(W, H, self.fusion.intrinsic,
                                      self.fusion.cfg)
            img = self._viewer.render(self.fusion.state,
                                      0.01 * self.frames_done,
                                      self.fusion.mean_depth)
            self.renders.append(img)
            self.timings["render"] += time.perf_counter() - t0
        return mask, out

    def run(self, seq, prefetch: int = 4, verbose: bool = True):
        """Stream a TUMSequence-like object end to end."""
        t_start = time.time()
        for fr in FramePrefetcher(seq, prefetch):
            self.step(fr["depth"], fr["color"], fr["extrinsic"],
                      fr.get("mean_depth"))
            if verbose:
                print(f"frame {self.frames_done}: "
                      f"objs={int(self.fusion.state.num_objs) if self.fusion.state is not None else 0}")
        wall = time.time() - t_start
        fps = max(self.frames_done - 1, 1) / wall
        if verbose:
            print(f"{self.frames_done} frames in {wall:.1f}s = {fps:.2f} "
                  f"fused frames/sec (detect {self.timings['detect']:.1f}s, "
                  f"fuse {self.timings['fuse']:.1f}s)")
        return fps


def main():
    import argparse

    from slam_maskrcnn_tpu.data.tum import TUMSequence
    from slam_maskrcnn_tpu.fusion import FusionConfig
    from slam_maskrcnn_tpu.models import MaskRCNN
    from slam_maskrcnn_tpu.samples.coco import CocoInferenceConfig

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--begin", type=float, default=-np.inf)
    p.add_argument("--end", type=float, default=np.inf)
    p.add_argument("--max-frames", type=int, default=100)
    p.add_argument("--vol-dim", type=int, default=256)
    p.add_argument("--backend", choices=["xla", "pallas"], default="pallas")
    p.add_argument("--render-every", type=int, default=0)
    a = p.parse_args()

    import jax.numpy as jnp

    model = MaskRCNN("inference", CocoInferenceConfig())
    if a.weights:
        model.load_weights(a.weights, by_name=True)
    else:
        model.init_params()
    seq = TUMSequence(a.dataset, begin=a.begin, end=a.end,
                      max_frames=a.max_frames)
    from slam_maskrcnn_tpu.fusion.state import make_intrinsic

    K = make_intrinsic(520.9, 521.0, 325.1, 249.7)
    pipe = LivePipeline(model, K,
                        FusionConfig(vol_dim=(a.vol_dim,) * 3,
                                     hist_dtype=jnp.uint16),
                        backend=a.backend, render_every=a.render_every)
    pipe.run(seq)


if __name__ == "__main__":
    main()
