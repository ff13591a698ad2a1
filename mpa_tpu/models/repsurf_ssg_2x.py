"""RepSurf-SSG-2x baseline classifier.

Reference semantics: ``models/repsurf/repsurf_ssg_umb_2x.py::Model`` —
UmbrellaSurfaceConstructor (10-ch RepSurf features) + 4 stacked
SurfaceAbstractionCD stages (512/128/32/group-all with widths doubled vs the
RepSurf paper baseline) + FC classifier head with log-softmax output.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpa_tpu.nn.umbrella_constructor import UmbrellaSurfaceConstructor
from mpa_tpu.nn.surface_abstraction import SurfaceAbstractionCD
from mpa_tpu.models.registry import register_model


class RepSurfSSG2x(nn.Module):
    num_classes: int = 15
    umbrella_k: int = 9
    umbrella_aggr: str = "sum"
    return_dist: bool = True
    return_polar: bool = True
    dropout: float = 0.4
    # Scale knobs (defaults = the published 2x config). sa_npoints shrinks the
    # SA ladder for small-input smoke/dryrun configs; width_div divides every
    # MLP/FC channel width. Keep both at defaults for parity with the
    # reference (models/repsurf/repsurf_ssg_umb_2x.py:11-61).
    sa_npoints: Optional[Tuple[int, int, int]] = None
    width_div: int = 1

    @nn.compact
    def __call__(
        self, points, *, train: bool = True, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        center = points[..., :3]
        normal = UmbrellaSurfaceConstructor(
            k=self.umbrella_k,
            channels=10,
            aggr_type=self.umbrella_aggr,
            return_dist=self.return_dist,
            name="surface_constructor",
        )(center, train=train, rng=rng)

        # Grouped position channels: centre-relative xyz (+ polar) = 6 with polar.
        pos_ch = 6 if self.return_polar else 3
        npts = self.sa_npoints or (512, 128, 32)
        dv = self.width_div

        def w(*chs):
            return tuple(max(8, c // dv) for c in chs)

        sa_defs = [
            dict(npoint=npts[0], radius=0.1, nsample=24, mlp=w(128, 128, 256)),
            dict(npoint=npts[1], radius=0.2, nsample=24, mlp=w(256, 256, 512)),
            dict(npoint=npts[2], radius=0.4, nsample=24, mlp=w(512, 512, 1024)),
        ]
        feature = None
        for i, d in enumerate(sa_defs):
            center, normal, feature = SurfaceAbstractionCD(
                npoint=d["npoint"],
                radius=d["radius"],
                nsample=d["nsample"],
                pos_channel=pos_ch,
                mlp=d["mlp"],
                return_polar=self.return_polar,
                name=f"sa{i + 1}",
            )(center, normal, feature, train=train)
        center, normal, feature = SurfaceAbstractionCD(
            npoint=0,
            radius=0.0,
            nsample=0,
            pos_channel=pos_ch,
            mlp=w(1024, 1024, 2048),
            group_all=True,
            return_polar=self.return_polar,
            name="sa4",
        )(center, normal, feature, train=train)
        x = feature[:, 0]  # [B, 2048 // width_div]

        for i, width in enumerate(w(512, 256)):
            x = nn.Dense(width, name=f"fc{i + 1}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                use_fast_variance=False,
                name=f"bn{i + 1}",
            )(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="fc3")(x)
        return jax.nn.log_softmax(x, axis=-1)


@register_model("repsurf_ssg_2x")
def _repsurf_ssg_2x(**kw) -> RepSurfSSG2x:
    return RepSurfSSG2x(**kw)
