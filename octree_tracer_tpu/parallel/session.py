"""Multi-chip streaming session: the full adaptive loop over a device mesh.

The single-chip ``Session`` (app/session.py) extended with pixel-row data
parallelism: rays shard across the mesh, the node pool is replicated on every
chip, per-frame visit counts ``psum`` over ICI (the frame loop's only
collective), the host adaptive engine runs once on the reduced counts, and
the resulting pool patches broadcast back to every chip as one replicated
scatter — the TPU-native scale-out of the reference's single-GPU loop
(reference: src/app.rs:97-119; SURVEY.md §7 multi-chip note).

Bit-equivalence with the single-chip session is structural: per-shard traces
are bit-identical to the unsharded wavefront (tested), the adaptive
thresholds read only filled-leaf counts and the interior zero-set — both
exact under every tracer mode — and candidate selection is deterministic
slot order, so both sessions apply identical mutations
(tests/test_parallel.py asserts pool equality frame by frame).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..app.session import Session
from ..render.camera import camera_matrices, generate_rays_device
from . import mesh as pmesh


class ShardedSession(Session):
    """Session whose frames render sharded over a ``jax.sharding.Mesh``."""

    def __init__(self, world, mesh, **kw):
        self.mesh = mesh
        super().__init__(world, **kw)
        if self.height % mesh.devices.size:
            raise ValueError(
                f"height {self.height} not divisible by mesh size "
                f"{mesh.devices.size}"
            )

    # -- replicated pool maintenance ------------------------------------------

    def _full_upload(self):
        super()._full_upload()
        self.device_words = pmesh.replicate(self.mesh, self.device_words)

    def _push_patches(self):
        n = super()._push_patches()
        # apply_patches preserves the replicated layout (sharding propagation
        # through the scatter); a full-upload fallback re-replicates above.
        return n

    # -- frame loop -------------------------------------------------------------

    def render(self):
        s = self.settings
        _, cam_inv = camera_matrices(
            self.character.pos, self.character.look, s.fov,
            self.width, self.height,
        )
        origin, dirs = generate_rays_device(cam_inv, self.width, self.height)
        # Same feedback cadence contract as the single-chip Session.render.
        adaptive = not s.pause_adaptive and (
            s.feedback_every <= 1
            or self.frame_count % s.feedback_every == 0
        )
        rows_per_shard = self.height // self.mesh.devices.size
        mode = (
            "beam" if rows_per_shard % 8 == 0 and self.width % 8 == 0
            else "staged"
        )
        warp = self._auto_warp(adaptive)
        # Same counted-frame closure contract as the single-chip session.
        self._frame_warped = adaptive and warp is not None
        self._frame_words = self.device_words
        img, result, visits = pmesh.render_frame_sharded(
            self.mesh,
            self._frame_words,
            jnp.asarray(origin),
            jnp.asarray(dirs),
            jnp.asarray(s.sun_dir),
            shadows=s.shadows,
            show_steps=s.show_steps,
            show_hits=s.show_hits,
            with_visits=adaptive,
            misc_bool=s.misc_bool,
            mode=mode,
            tile_size=None,
            # Match the single-chip Session's frame contract: the presented
            # u8 display-encoded image (render_frame u8_image).
            u8_image=True,
            visit_flags=adaptive and s.visit_flags and not s.show_hits,
            # Replicated auto-warp table, same policy as the single-chip
            # session (maintained by the inherited incremental
            # invalidation; per-shard traces stay bit-identical).
            warp_table=warp,
        )
        self._last_visits = visits
        return img, result
