"""Benchmark harness over baryonyx-format CSV suites
(reference: app/src/benchmark.cpp)."""

from baryonyx_tpu.bench.harness import benchmark
