"""Coarsening strategies (reference: amgcl/coarsening/)."""

from .aggregates import (
    plain_aggregates,
    pointwise_aggregates,
    strong_connections,
    Aggregates,
)
from .tentative import tentative_prolongation
from .smoothed_aggregation import SmoothedAggregation, galerkin, spectral_radius

COARSENING = {
    "smoothed_aggregation": SmoothedAggregation,
}


def make_coarsening(name: str, **params):
    try:
        cls = COARSENING[name]
    except KeyError:
        raise ValueError(
            f"unknown coarsening {name!r}; available: {sorted(COARSENING)}"
        ) from None
    return cls(**params)
