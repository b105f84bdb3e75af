"""Coarsening strategies (reference: amgcl/coarsening/)."""

from .aggregates import (
    plain_aggregates,
    pointwise_aggregates,
    strong_connections,
    Aggregates,
)
from .tentative import tentative_prolongation
from .smoothed_aggregation import SmoothedAggregation, galerkin, spectral_radius
from .aggregation import Aggregation
from .ruge_stuben import RugeStuben
from .grid_aggregation import GridAggregation, GridTransfer
from .smoothed_aggr_emin import SmoothedAggrEMin
from .as_scalar import AsScalar
from .rigid_body_modes import rigid_body_modes

COARSENING = {
    "smoothed_aggregation": SmoothedAggregation,
    "smoothed_aggr_emin": SmoothedAggrEMin,
    "aggregation": Aggregation,
    "ruge_stuben": RugeStuben,
    "grid_aggregation": GridAggregation,
}


def make_coarsening(name: str, **params):
    try:
        cls = COARSENING[name]
    except KeyError:
        raise ValueError(
            f"unknown coarsening {name!r}; available: {sorted(COARSENING)}"
        ) from None
    return cls(**params)
