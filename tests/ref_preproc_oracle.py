"""Load the reference's OWN preprocessing code as a parity oracle.

Round 4 made the reference's torch nets/trainer the oracle for the
model/update-rule layer (``tests/ref_oracle.py``).  This module does the
same for the mm-critical PREPROCESSING layer — the code SURVEY.md calls
where "the ±0.5 mm gate lives or dies":

* ``utils/handdetector.py`` (crop/resize/augment workhorses,
  reference handdetector.py:384-492, 682-918);
* ``data/dataset_hand2.py``'s module-level ``normalize`` /
  ``augmentCrop`` (dataset_hand2.py:27-119);
* ``data/importers.py``'s ``DepthImporter`` projection math and the
  per-dataset ``loadDepthMap`` file-format readers
  (importers.py:84-123, 987-1004, 217-228, 640-658);
* ``data/transformations.py`` rotation/affine helpers.

The sources are Python-2-era; they are loaded read-only from
``/root/reference`` with *mechanical* shims that preserve py2 semantics
instead of porting them (porting would re-introduce exactly the
"re-authored double" risk this oracle removes):

* ``str.expandtabs(8)`` — py2 treated a tab as 8 columns, py3 rejects
  the mix (dataset_hand2.py:77, importers.py:381);
* py2 print *statements* → calls (one real site, handdetector.py:214);
* py2 division: every ``a / b`` is rewritten (AST) to ``_py2div(a, b)``
  which floors for integral operands — the resize size math at
  handdetector.py:366-368/446-448 relies on py2 ``int/int`` flooring;
* ``xrange`` → ``range``; ``numpy.float``-era aliases via a module
  proxy (removed in numpy ≥1.24, used at handdetector.py:106/636);
* cv2 3.x 3-tuple ``findContours`` unpack at handdetector.py:588 →
  the 2-tuple modern return (values are identical);
* ``cPickle``/``progressbar`` import stubs for importers.py:29,34.

Nothing is copied into the repo: the reference modules are read from
their own files at test time and used purely as numeric oracles.
"""

from __future__ import annotations

import ast
import importlib
import os
import re
import sys
import types

import numpy as np

REF_SRC = "/root/reference/src"
_cache: dict = {}


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REF_SRC, "utils/handdetector.py"))


# ---------------------------------------------------------------------------
# py2 semantics shims
# ---------------------------------------------------------------------------

def _py2div(a, b):
    """Python-2 ``/``: floor division when both operands are integral
    (python ints or integer ndarrays), true division otherwise."""
    import numbers

    a_int = isinstance(a, numbers.Integral) or (
        isinstance(a, np.ndarray) and a.dtype.kind in "iub")
    b_int = isinstance(b, numbers.Integral) or (
        isinstance(b, np.ndarray) and b.dtype.kind in "iub")
    if a_int and b_int:
        return a // b
    return a / b


class _DivRewriter(ast.NodeTransformer):
    """Rewrite ``a / b`` → ``_py2div(a, b)``.  Augmented ``/=`` is left
    alone: every reference ``/=`` site operates on float arrays (where
    py2 and py3 agree), and keeping it preserves in-place mutation."""

    def visit_BinOp(self, node):
        self.generic_visit(node)
        if isinstance(node.op, ast.Div):
            return ast.copy_location(
                ast.Call(func=ast.Name(id="_py2div", ctx=ast.Load()),
                         args=[node.left, node.right], keywords=[]),
                node)
        return node


# py2 print statements: plain string literals (handdetector.py:214) and
# single-line `print "..." % (...)` forms (handpose_evaluation.py:526-529)
_PRINT_STMT = re.compile(
    r"^(\s*)print ((?:\"[^\"]*\"|'[^']*')(?:\s*%\s*\(.*\))?)\s*$",
    re.MULTILINE)

# cv2 3.x-era 3-tuple findContours unpack (handdetector.py:588)
_FINDCONTOURS3 = re.compile(
    r"^(\s*)im2, contours, hierarchy = cv2\.findContours",
    re.MULTILINE)


class _ModProxy:
    """Attribute-forwarding proxy so exec'd reference code can keep
    using removed aliases (``numpy.float`` et al.)."""

    def __init__(self, real, **overrides):
        self._real = real
        self._over = overrides

    def __getattr__(self, name):
        if name in self._over:
            return self._over[name]
        return getattr(self._real, name)


def _np_proxy():
    return _ModProxy(np, float=float, int=int, bool=bool, object=object)


def _old_mode(a, *args, **kw):
    """scipy<1.11 ``stats.mode``: returns (mode_array, count_array) with
    the SMALLEST most-frequent value (np.unique sort order), indexable
    as ``[0][0]`` the way handdetector.py:130-132 does.  Empty input
    yields 0.0 — the only case the original would have crashed on too
    (and the convention our rebuild documents in
    ``HandDetector.get_nd_value``)."""
    a = np.asarray(a)
    if a.size == 0:
        return (np.zeros(1, a.dtype), np.array([0]))
    uniq, counts = np.unique(a, return_counts=True)
    i = int(np.argmax(counts))
    return (uniq[i:i + 1].copy(), counts[i:i + 1].copy())


def _exec_reference(relpath: str, name: str,
                    preseed: dict | None = None) -> types.ModuleType:
    """expandtabs → print/findContours shims → Div rewrite → exec."""
    path = os.path.join(REF_SRC, relpath)
    with open(path) as f:
        src = f.read().expandtabs(8)
    src = _PRINT_STMT.sub(r"\1print(\2)", src)
    src = _FINDCONTOURS3.sub(r"\1contours, hierarchy = cv2.findContours",
                             src)
    tree = _DivRewriter().visit(ast.parse(src, filename=path))
    ast.fix_missing_locations(tree)
    mod = types.ModuleType(name)
    mod.__file__ = path
    mod.__dict__["_py2div"] = _py2div
    mod.__dict__["xrange"] = range
    if preseed:
        mod.__dict__.update(preseed)
    sys.modules[name] = mod
    exec(compile(tree, path, "exec"), mod.__dict__)
    # reference code reads numpy.float/np.float at call time; rebind the
    # module-level import to the alias proxy AFTER exec (exec's own
    # `import numpy` overwrote any preseed)
    if "numpy" in mod.__dict__ and isinstance(mod.__dict__["numpy"],
                                              types.ModuleType):
        mod.__dict__["numpy"] = _np_proxy()
    if "np" in mod.__dict__ and isinstance(mod.__dict__["np"],
                                           types.ModuleType) \
            and mod.__dict__["np"] is np:
        mod.__dict__["np"] = _np_proxy()
    if "stats" in mod.__dict__ and isinstance(mod.__dict__["stats"],
                                              types.ModuleType):
        mod.__dict__["stats"] = _ModProxy(mod.__dict__["stats"],
                                          mode=_old_mode)
    # handpose_evaluation.py does `import scipy` and calls
    # scipy.stats.nanmedian (removed in scipy 0.18).  np.nanmedian is
    # the drop-in: the only call site (getMedianError,
    # handpose_evaluation.py:120) wants "median error over all joints"
    # per its own docstring, i.e. the axis=None scalar.  (The removed
    # function's axis=0 default would have returned per-joint medians —
    # a latent bug in the never-called reference method; documented in
    # docs/PARITY.md.)
    if "scipy" in mod.__dict__ and isinstance(mod.__dict__["scipy"],
                                              types.ModuleType):
        real_scipy = mod.__dict__["scipy"]
        import scipy.stats as _scipy_stats  # ensure submodule is loaded

        mod.__dict__["scipy"] = _ModProxy(
            real_scipy,
            stats=_ModProxy(_scipy_stats, mode=_old_mode,
                            nanmedian=np.nanmedian))
    return mod


def _ensure_pkg(name: str) -> types.ModuleType:
    pkg = sys.modules.get(name)
    if pkg is None:
        pkg = types.ModuleType(name)
        pkg.__path__ = []
        sys.modules[name] = pkg
    elif not hasattr(pkg, "__path__"):
        pkg.__path__ = []
    return pkg


def load_ref_preproc() -> dict:
    """Import the reference preprocessing stack; idempotent.

    Returns ``{"handdetector", "transformations", "importers",
    "dataset_hand2"}`` → loaded module objects.
    """
    if _cache:
        return _cache
    if not reference_available():
        raise RuntimeError("/root/reference not present")

    # headless matplotlib before handdetector's `import pylab`
    os.environ.setdefault("MPLBACKEND", "Agg")
    import matplotlib

    matplotlib.use("Agg", force=True)

    # import stubs used by importers.py module level
    if "cPickle" not in sys.modules:
        import pickle

        sys.modules["cPickle"] = pickle
    if "progressbar" not in sys.modules:
        pb = types.ModuleType("progressbar")

        class _Bar:  # noqa: N801 - matching progressbar.ProgressBar
            def __init__(self, *a, **k):
                pass

            def start(self):
                return self

            def update(self, *a):
                pass

            def finish(self):
                pass

        pb.ProgressBar = _Bar
        pb.Percentage = lambda *a, **k: None
        pb.Bar = lambda *a, **k: None
        sys.modules["progressbar"] = pb

    data_pkg = _ensure_pkg("data")
    utils_pkg = _ensure_pkg("utils")

    transformations = _exec_reference("data/transformations.py",
                                      "data.transformations")
    data_pkg.transformations = transformations

    # basetypes parses cleanly under py3 — plain import from the
    # reference tree
    spec = importlib.util.spec_from_file_location(
        "data.basetypes", os.path.join(REF_SRC, "data/basetypes.py"))
    basetypes = importlib.util.module_from_spec(spec)
    sys.modules["data.basetypes"] = basetypes
    spec.loader.exec_module(basetypes)
    data_pkg.basetypes = basetypes

    handdetector = _exec_reference("utils/handdetector.py",
                                   "utils.handdetector")
    utils_pkg.handdetector = handdetector

    importers = _exec_reference("data/importers.py", "data.importers")
    data_pkg.importers = importers

    dataset = _exec_reference("data/dataset.py", "data.dataset")
    data_pkg.dataset = dataset

    dataset_hand2 = _exec_reference("data/dataset_hand2.py",
                                    "data.dataset_hand2")
    data_pkg.dataset_hand2 = dataset_hand2

    # evaluation stack (§2.6): helpers is py3-clean; handpose_evaluation
    # needs the era shims; legacy evaluation.py is registered under a
    # PRIVATE name because tests/ref_oracle.py stubs "utils.evaluation"
    # for the trainer oracle and both may live in one pytest session.
    spec = importlib.util.spec_from_file_location(
        "utils.helpers", os.path.join(REF_SRC, "utils/helpers.py"))
    helpers = importlib.util.module_from_spec(spec)
    sys.modules["utils.helpers"] = helpers
    spec.loader.exec_module(helpers)
    utils_pkg.helpers = helpers

    handpose_evaluation = _exec_reference("utils/handpose_evaluation.py",
                                          "utils.handpose_evaluation")
    utils_pkg.handpose_evaluation = handpose_evaluation

    evaluation = _exec_reference("utils/evaluation.py",
                                 "lsps_reference_oracle.evaluation")

    _cache.update(handdetector=handdetector,
                  transformations=transformations,
                  importers=importers,
                  dataset_hand2=dataset_hand2,
                  handpose_evaluation=handpose_evaluation,
                  evaluation=evaluation)
    return _cache
