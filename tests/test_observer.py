"""Observer tests (reference: lib/test/lib.cpp:565 — the pnm observer
writes image files; observer.hpp:205-249 for the pnm/file variants)."""

import os

import numpy as np
import pytest

import baryonyx_tpu as bx
from baryonyx_tpu.core.params import ObserverType
from baryonyx_tpu.generators import random_set_cover_lp
from baryonyx_tpu.observer import (
    FileObserver,
    NoneObserver,
    PnmObserver,
    make_observer,
    write_pnm,
)


def test_write_pnm_roundtrip(tmp_path):
    rgb = np.zeros((4, 6, 3), np.uint8)
    rgb[1, 2] = (255, 0, 7)
    path = str(tmp_path / "img.pnm")
    write_pnm(path, rgb)
    with open(path, "rb") as fh:
        data = fh.read()
    assert data.startswith(b"P6\n6 4\n255\n")
    body = data[len(b"P6\n6 4\n255\n"):]
    assert np.array_equal(
        np.frombuffer(body, np.uint8).reshape(4, 6, 3), rgb
    )


def test_pnm_observer_writes_files(tmp_path):
    obs = PnmObserver("trace", str(tmp_path))
    P = np.linspace(-1, 1, 12).reshape(3, 4)
    pi = np.array([0.5, -0.5, 0.0])
    obs.make_observation(P, pi, loop=0)
    obs.make_observation(P * 2, pi, loop=1)
    files = sorted(os.listdir(tmp_path))
    assert files == [
        "trace-P-000000.pnm",
        "trace-P-000001.pnm",
        "trace-pi-000000.pnm",
        "trace-pi-000001.pnm",
    ]


def test_file_observer_writes_parsable_text(tmp_path):
    obs = FileObserver("trace", str(tmp_path))
    P = np.arange(6, dtype=float).reshape(2, 3)
    pi = np.array([1.5, -2.25])
    obs.make_observation(P, pi, loop=0)
    got = np.loadtxt(tmp_path / "trace-P-000000.txt")
    assert np.allclose(got, P)
    got_pi = np.loadtxt(tmp_path / "trace-pi-000000.txt")
    assert np.allclose(got_pi, pi)


def test_make_observer_dispatch():
    assert isinstance(make_observer(ObserverType.pnm), PnmObserver)
    assert isinstance(make_observer(ObserverType.file), FileObserver)
    assert isinstance(make_observer(ObserverType.none), NoneObserver)


def test_solve_with_observer_dumps(tmp_path, monkeypatch):
    # observers fire at chunk boundaries in solve mode
    # (reference call site: itm-solver-common.hpp:128-137)
    monkeypatch.chdir(tmp_path)
    pb = bx.parse_lp(random_set_cover_lp(8, 24, 0.3, seed=2))
    ctx = bx.make_context(0)
    ctx.parameters.observer = ObserverType.pnm
    ctx.parameters.limit = 30
    ctx.parameters.seed = 3
    ctx.parameters.time_limit = 5.0
    bx.solve(ctx, pb)
    pnms = [f for f in os.listdir(tmp_path) if f.endswith(".pnm")]
    assert pnms, "solve with observer-type pnm must write PNM dumps"
