"""`python -m baryonyx_tpu` — the CLI entry point (reference analogue:
app/src/main.cpp:1170)."""

from baryonyx_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
