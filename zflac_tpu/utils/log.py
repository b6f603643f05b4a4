"""Scoped debug logging, mirroring the reference's four std.log scopes
(.zflac / .zflac_frame / .zflac_subframe / .zflac_residual,
/root/reference/src/zflac.zig:5-8). Enable with e.g.
ZFLAC_TPU_LOG=frame,residual or ZFLAC_TPU_LOG=all."""

from __future__ import annotations

import logging
import os

SCOPES = ("stream", "frame", "subframe", "residual", "kernel", "shard")


def scoped_loggers() -> dict[str, logging.Logger]:
    return {s: logging.getLogger(f"zflac_tpu.{s}") for s in SCOPES}


def get_logger(scope: str) -> logging.Logger:
    assert scope in SCOPES, scope
    return logging.getLogger(f"zflac_tpu.{scope}")


def _configure_from_env() -> None:
    spec = os.environ.get("ZFLAC_TPU_LOG", "")
    if not spec:
        return
    wanted = SCOPES if spec == "all" else tuple(
        s.strip() for s in spec.split(","))
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("%(name)s: %(message)s"))
    for s in wanted:
        if s in SCOPES:
            lg = get_logger(s)
            lg.setLevel(logging.DEBUG)
            lg.addHandler(handler)


_configure_from_env()
