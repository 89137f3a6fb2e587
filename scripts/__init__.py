"""CLI layer (reference scripts/ layout, SURVEY §2.2).

A package so the console entry points resolve: in a wheel the CLI layer
installs as ``nerfmlp_tpu.scripts`` (pyproject's package-dir mapping —
never the generic top-level ``scripts`` name in site-packages), so the
entry points read ``nerfmlp-train = "nerfmlp_tpu.scripts.train:main"``.
Each module is also directly runnable from a checkout
(`python scripts/train.py …`), matching how the reference's CLIs are
invoked from the repo root.
"""
