"""MoGe-2 metric monocular depth (JAX) — runner interface.

The pipeline uses MoGe only for metric-scale recovery: infer depth on a
chunk's first frame, take the median MoGe/Pi3 depth ratio
(slam/offline_chunk_creator.py:122-127,182-192). The full MoGe-2 model
(DINOv2 encoder + ConvStack neck/heads + scale head, moge/model/v2.py) is
implemented in this module; MoGeRunner wraps it behind the one call the
pipeline needs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class MoGeRunner:
    """infer_depth((3, H, W) float [0,1]) -> (H, W) metric depth."""

    def __init__(self, checkpoint_path: Optional[str]):
        if checkpoint_path is None:
            raise FileNotFoundError(
                "MoGe checkpoint not provided (convert with tools/convert_checkpoint.py "
                "--model moge); pipeline continues without metric depth"
            )
        import jax

        from .convert import load_params_npz
        from .moge_model import MoGeConfig, moge_infer_depth

        import jax.numpy as jnp

        self.params = load_params_npz(checkpoint_path)
        self.cfg = MoGeConfig.from_params(self.params)
        self.params.pop("_config_json", None)  # string metadata, not a jit arg
        # pin parameters on device: numpy leaves would re-upload the whole
        # tree on every call (the remote-TPU tunnel here moves ~30 MB/s);
        # the host copy survives backend-crash recovery
        self._host_params = self.params
        self.params = jax.device_put(self.params)

        def infer(p, img):
            if img.dtype == jnp.uint8:  # raw bytes from the uint8 loader path
                img = img.astype(jnp.float32) / 255.0
            return moge_infer_depth(p, img, self.cfg)

        self._infer = jax.jit(infer)
        self._infer_one = infer
        self._infer_batch = jax.jit(
            lambda p, imgs: jax.vmap(lambda im: infer(p, im))(imgs)
        )
        self._infer_batch_sharded = None
        self._mesh = None

    def shard_params(self, mesh) -> None:
        """Replicate parameters over a device mesh so batched inference can
        dp-shard its input (chunk-dp groups: one first frame per chunk)."""
        import jax
        from jax.experimental.shard_map import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._mesh = mesh
        self.params = jax.device_put(self._host_params, NamedSharding(mesh, P()))
        # batch forwards are embarrassingly parallel over chunks: shard_map at
        # the TOP (replicated params, dp-sharded batch) so each dp group runs
        # its chunks as plain single-device programs — no collectives, and the
        # Pallas attention kernels (opaque to GSPMD, which would otherwise
        # all-gather the batch and replicate the encoder) stay legal inside
        infer = self._infer_one
        self._infer_batch_sharded = jax.jit(
            shard_map(
                lambda p, imgs: jax.vmap(lambda im: infer(p, im))(imgs),
                mesh=mesh,
                in_specs=(P(), P("dp")),
                out_specs=P("dp"),
                check_rep=False,
            )
        )

    def reset(self) -> None:
        """Re-pin parameters after a backend crash/reset (device buffers from
        the dead backend are invalid)."""
        import jax

        if self._mesh is not None:
            self.shard_params(self._mesh)
        else:
            self.params = jax.device_put(self._host_params)

    def infer_depth_async(self, image: np.ndarray):
        """Dispatch depth inference; returns the (H, W) device array without
        blocking — lets the online pipeline queue MoGe right behind the Pi3
        chunk step and pull both at consume time."""
        import jax.numpy as jnp

        return self._infer(self.params, jnp.asarray(image))

    def infer_depth_batch_async(self, images: np.ndarray):
        """Batched dispatch over (B, 3, H, W) first frames -> (B, H, W) depth.

        On a chunk-dp mesh the batch is sharded over the dp axis so every
        chunk's metric-scale forward runs on its own devices concurrently
        (instead of B sequential forwards on chip 0)."""
        import jax
        import jax.numpy as jnp

        imgs = jnp.asarray(images)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            imgs = jax.device_put(imgs, NamedSharding(self._mesh, P("dp")))
            return self._infer_batch_sharded(self.params, imgs)
        return self._infer_batch(self.params, imgs)

    def infer_depth(self, image: np.ndarray) -> np.ndarray:
        return np.asarray(self.infer_depth_async(image))
