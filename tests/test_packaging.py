"""Packaging contract (pyproject.toml).

The reference ships a requirements.txt and a versioned package
(/root/reference/requirements.txt:1-16, nerfmlp/__init__.py:12); here the
equivalents are pyproject.toml + nerfmlp_tpu.__version__. These tests pin
that the version is single-sourced and every declared console entry point
resolves to a real callable — without requiring the package to be
installed.
"""

import importlib
import os

try:
    import tomllib  # stdlib from 3.11
except ModuleNotFoundError:  # pragma: no cover - 3.10 (requires-python
    import pytest              # floor) has no stdlib TOML parser

    tomllib = pytest.importorskip("tomli")

import nerfmlp_tpu

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_version_single_sourced():
    cfg = _pyproject()
    assert "version" in cfg["project"]["dynamic"]
    attr = cfg["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    assert attr == "nerfmlp_tpu.__version__"
    assert isinstance(nerfmlp_tpu.__version__, str)
    assert nerfmlp_tpu.__version__.count(".") == 2
    # If an (editable) install exists, its metadata must agree.
    try:
        import importlib.metadata as md

        installed = md.version("nerfmlp-tpu")
    except Exception:
        return
    assert installed == nerfmlp_tpu.__version__


def _pkg_dir(cfg):
    return cfg["tool"]["setuptools"].get("package-dir", {})


def test_declared_packages_exist():
    cfg = _pyproject()
    pkg_dir = _pkg_dir(cfg)
    for pkg in cfg["tool"]["setuptools"]["packages"]:
        rel = pkg_dir.get(pkg, os.path.join(*pkg.split(".")))
        path = os.path.join(ROOT, rel, "__init__.py")
        assert os.path.exists(path), f"declared package missing: {pkg}"


def test_no_top_level_scripts_package_installed():
    """The wheel must not claim the generic top-level `scripts` name in
    site-packages: the CLI layer installs as nerfmlp_tpu.scripts via
    package-dir (the repo keeps scripts/ at the root for the reference's
    `python scripts/train.py` layout)."""
    cfg = _pyproject()
    assert "scripts" not in cfg["tool"]["setuptools"]["packages"]
    assert _pkg_dir(cfg).get("nerfmlp_tpu.scripts") == "scripts"
    for target in cfg["project"]["scripts"].values():
        assert target.startswith("nerfmlp_tpu.scripts."), target


def test_console_entry_points_resolve():
    cfg = _pyproject()
    entries = cfg["project"]["scripts"]
    # The main CLIs are all exposed.
    for want in ("nerfmlp-train", "nerfmlp-render", "nerfmlp-serve"):
        assert want in entries
    for name, target in entries.items():
        mod_name, func_name = target.split(":")
        # In a checkout nerfmlp_tpu.scripts only exists through the
        # package-dir mapping; resolve through the repo-root alias.
        alias = mod_name.replace("nerfmlp_tpu.scripts.", "scripts.")
        mod = importlib.import_module(alias)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_core_dependencies_declared():
    deps = " ".join(_pyproject()["project"]["dependencies"])
    for pkg in ("jax", "flax", "optax", "numpy", "pillow", "matplotlib",
                "imageio", "psutil"):
        assert pkg in deps, f"{pkg} missing from dependencies"
    # torch stays OPTIONAL: only .pth interop / TensorBoard need it.
    assert "torch" not in deps
    extras = _pyproject()["project"]["optional-dependencies"]
    assert any("torch" in " ".join(v) for v in extras.values())
