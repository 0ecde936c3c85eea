"""Model registry (reference: model/cf/model.go:330-350 UnmarshalModel)."""

from __future__ import annotations

from .params import Params


def create_mf_model(name: str, params: Params | dict | None = None):
    from .bpr import BPR

    if name == "bpr":
        return BPR(params)
    if name == "als":
        from .als import ALS

        return ALS(params)
    raise KeyError(f"unknown MF model {name!r}")
