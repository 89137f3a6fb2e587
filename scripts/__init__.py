"""CLI layer (reference scripts/ layout, SURVEY §2.2).

A package so the pyproject console entry points (`nerfmlp-train =
"scripts.train:main"`, …) resolve under an editable install; each module
is also directly runnable (`python scripts/train.py …`), matching how the
reference's CLIs are invoked from the repo root.
"""
