"""resolve_smoother's feasibility gates (r5): the auto mode must never
pick the fused Pallas kernel when its VMEM-resident state cannot fit the
scoped allocation budget (compile-time OOM otherwise — measured 23.2 MB
at V=8192 x degree=20 against the 16 MB default), and the
FLAME_TPU_SCOPED_VMEM_KIB override must widen the gate."""

import numpy as np
import pytest

from flame_tpu.core import pipeline
from flame_tpu.params import Params, SolverParams


def params_with(degree):
    return Params(feature_capacity=8192, edge_capacity=24576,
                  triangle_capacity=16384,
                  solver=SolverParams(max_vertex_degree=degree))


def test_auto_respects_vmem_budget(monkeypatch):
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # V=4096 x d20 fits the 16 MB default (measured ~11.6 MB live).
    assert pipeline.resolve_smoother(
        Params(solver=SolverParams(max_vertex_degree=20)), 4096) == "pallas"
    # V=8192 x d20 does not (measured 23.2 MB) -> vertex fallback.
    assert pipeline.resolve_smoother(params_with(20), 8192) == "vertex"


def test_env_budget_widens_gate(monkeypatch):
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pipeline, "SCOPED_VMEM_KIB", 33600)
    assert pipeline.resolve_smoother(params_with(20), 8192) == "pallas"


def test_explicit_mode_is_honored(monkeypatch):
    """An explicit smoother choice bypasses the gates — the caller said
    so (and may have raised the backend budget out of band)."""
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    p = params_with(20).replace(
        solver=SolverParams(max_vertex_degree=20, smoother="pallas"))
    assert pipeline.resolve_smoother(p, 8192) == "pallas"


def test_fallback_warns_once(monkeypatch, capsys):
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pipeline, "_warned_pallas_vmem", False)
    pipeline.resolve_smoother(params_with(20), 8192)
    pipeline.resolve_smoother(params_with(20), 8192)
    err = capsys.readouterr().err
    assert err.count("scoped-VMEM budget") == 1


def test_non_multiple_of_128_falls_back(monkeypatch):
    import jax
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert pipeline.resolve_smoother(
        Params(solver=SolverParams(max_vertex_degree=20)), 1000) == "vertex"
