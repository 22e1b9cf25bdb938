"""Package-quality checks — the analog of the reference's Aqua.jl QA suite
(reference: Project.toml test deps; SURVEY.md §4)."""

import importlib
import inspect
import pkgutil
import subprocess
import sys

import pytest

import pawsometracker_tpu as pkg


def all_submodules():
    mods = []
    for m in pkgutil.walk_packages(pkg.__path__, prefix="pawsometracker_tpu."):
        if ".io.native." in m.name:
            continue
        mods.append(m.name)
    return mods


def test_version():
    assert isinstance(pkg.__version__, str) and pkg.__version__.count(".") == 2


def test_all_exports_exist():
    for name in pkg.__all__:
        assert hasattr(pkg, name), f"__all__ names missing attribute {name}"


def test_sole_reference_export_present():
    # the reference's single export is `track` (reference: src/PawsomeTracker.jl:26)
    assert callable(pkg.track)


@pytest.mark.parametrize("mod", all_submodules())
def test_submodules_importable(mod):
    importlib.import_module(mod)


@pytest.mark.parametrize("mod", all_submodules())
def test_public_functions_documented(mod):
    m = importlib.import_module(mod)
    assert m.__doc__, f"{mod} missing module docstring"
    for name, obj in vars(m).items():
        if name.startswith("_") or not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != mod:
            continue  # re-export
        assert obj.__doc__, f"{mod}.{name} missing docstring"


def test_no_heavy_import_side_effects():
    """Importing the package must not initialize JAX backends or open devices
    (keeps CLI startup and multi-process use cheap)."""
    code = (
        "import sys\n"
        "import pawsometracker_tpu\n"
        "assert 'cv2' not in sys.modules, 'cv2 imported at package import'\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, 'JAX backend initialized at package import'\n"
        "print('clean')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "clean" in r.stdout, r.stdout + r.stderr


def test_packaging_metadata():
    """pyproject.toml exists, installs a `pawsometrack` console script, and
    agrees with the package version (reference analog: Project.toml)."""
    import os
    import tomllib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["name"] == "pawsometracker-tpu"
    assert meta["project"]["version"] == pkg.__version__
    assert meta["project"]["scripts"]["pawsometrack"] == "pawsometracker_tpu.__main__:main"
    # the lazily-built native sources ship with the wheel
    native_data = meta["tool"]["setuptools"]["package-data"]["pawsometracker_tpu.io.native"]
    assert "pawsio.cpp" in native_data and "Makefile" in native_data


def test_generated_api_reference_is_current():
    """docs/reference.md is generated from the live docstrings and must not
    rot (reference analog: the Documenter build, docs/make.jl:61-70)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "build_docs.py"), "--check"],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_html_site_renders(tmp_path):
    """The static-site renderer (the deployable Documenter-build analog,
    reference docs/make.jl:61-70) must produce a navigable page per doc:
    every SITE_PAGES entry exists, carries the shared nav, and the markdown
    actually converted (tables/fenced code, no raw ``##`` leakage)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    import build_docs

    n = build_docs.render_site(str(tmp_path))
    assert n == len(build_docs.SITE_PAGES)
    for slug, _, title in build_docs.SITE_PAGES:
        html = (tmp_path / f"{slug}.html").read_text()
        assert "<nav>" in html and "class=current" in html
        assert title in html
        assert "\n## " not in html  # headings converted, not leaked raw
    assert (tmp_path / "style.css").exists()
    # the COMMITTED site (docs/site/, the in-repo navigable artifact —
    # reference ships its Documenter build too) must be current: byte-equal
    # to a fresh render of the committed sources
    site = os.path.join(root, "docs", "site")
    assert os.path.isdir(site), "docs/site missing — run tools/build_docs.py --html"
    for slug, _, _ in build_docs.SITE_PAGES:
        committed = os.path.join(site, f"{slug}.html")
        assert os.path.exists(committed), f"{slug}.html missing from docs/site"
        assert open(committed).read() == (tmp_path / f"{slug}.html").read_text(), (
            f"docs/site/{slug}.html is stale — run tools/build_docs.py --html"
        )


def test_license_and_citation_shipped():
    """LICENSE and CITATION.cff files exist and match the metadata — the
    reference ships both (reference: LICENSE:1, CITATION.cff:1), and wheel
    metadata needs a real license file to be distributable."""
    import os
    import tomllib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lic = os.path.join(root, "LICENSE")
    assert os.path.exists(lic)
    with open(lic) as f:
        assert "MIT License" in f.read()
    cff = os.path.join(root, "CITATION.cff")
    assert os.path.exists(cff)
    with open(cff) as f:
        cff_text = f.read()
    assert f"version: {pkg.__version__}" in cff_text
    assert "license: MIT" in cff_text
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["license"] == {"file": "LICENSE"}


def test_api_signature_stability():
    sig = inspect.signature(pkg.track)
    expected = {
        "file",
        "start",
        "stop",
        "target_width",
        "start_location",
        "window_size",
        "darker_target",
        "fps",
        "diagnostic_file",
        "sar",
        "backend",
        "chunk_size",
        "engine",
    }
    assert expected <= set(sig.parameters), sig
