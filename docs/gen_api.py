"""API reference generator (stdlib-only).

The reference generates its docs from code comments with Ford/Doxygen/
Sphinx (reference Documentation/Makefile, Documentation/source/
index.rst); this is the same pipeline without the external toolchain:
walk the public surface, group it into the reference's own page layout
(electronic solvers / generic solvers / parameters / basic parallel /
basic / maps / other — reference Documentation/source/*.rst), and emit
markdown from the live docstrings and signatures.  Run:

    python docs/gen_api.py [outdir]

A Sphinx scaffold mirroring the same grouping lives in docs/source/ for
users with sphinx installed.
"""
from __future__ import annotations

import inspect
import os
import sys

# the reference's page grouping (Documentation/source/*.rst)
PAGES = {
    "electronic_solvers": [
        "DensityMatrixSolvers", "FermiOperator", "GeometryOptimization",
    ],
    "generic_solvers": [
        "ChebyshevPolynomial", "HermitePolynomial", "Polynomial",
        "EigenSolvers", "ExponentialSolvers", "InverseSolvers",
        "LinearSolvers", "RootSolvers", "SignSolvers",
        "SquareRootSolvers", "TrigonometrySolvers", "Analysis",
    ],
    "parameters": ["SolverParameters", "Permutation", "LoadBalancer"],
    "basic_parallel": [
        "Matrix_ps", "PMatrixMemoryPool", "ProcessGrid",
        "ConstructGlobalProcessGrid", "DestructGlobalProcessGrid",
        "GetGlobalIsRoot", "GetGlobalMyRow", "GetGlobalMyColumn",
        "GetGlobalMySlice",
    ],
    "basic": [
        "Triplet_r", "Triplet_c", "TripletList_r", "TripletList_c",
        "Matrix_lsr", "Matrix_lsc", "MatrixMemoryPool_r",
        "MatrixMemoryPool_c",
    ],
    "maps": ["MatrixMapper", "RealOperation", "ComplexOperation"],
    "other": [
        "ActivateLogger", "DeactivateLogger", "EnterSubLog", "ExitSubLog",
        "WriteHeader", "WriteElement", "WriteListElement",
        "RegisterTimer", "StartTimer", "StopTimer", "PrintAllTimers",
        "PrintAllTimersDistributed", "EigenBounds", "MatrixConversion",
        "ComplexEmbedding", "NTPolyError", "GridError", "IOFormatError",
        "ConvergenceError",
    ],
}

TITLES = {
    "electronic_solvers": "Electronic Structure Solvers",
    "generic_solvers": "Generic Matrix-Function Solvers",
    "parameters": "Solver Parameters",
    "basic_parallel": "Distributed Matrices and Process Grids",
    "basic": "Local Matrices and Triplets",
    "maps": "Matrix Maps",
    "other": "Logging, Bounds, and Conversion",
}


# binding classes delegate to these solver modules; their module
# docstrings (algorithms, citations, reference file:line) are the
# substance the generated page should carry
IMPL_MODULES = {
    "DensityMatrixSolvers": "ntpoly_tpu.solvers.density",
    "FermiOperator": "ntpoly_tpu.solvers.fermi",
    "GeometryOptimization": "ntpoly_tpu.solvers.geometry",
    "EigenSolvers": "ntpoly_tpu.solvers.eigen",
    "ExponentialSolvers": "ntpoly_tpu.solvers.exponential",
    "InverseSolvers": "ntpoly_tpu.solvers.inverse",
    "LinearSolvers": "ntpoly_tpu.solvers.linear",
    "RootSolvers": "ntpoly_tpu.solvers.roots",
    "SignSolvers": "ntpoly_tpu.solvers.sign",
    "SquareRootSolvers": "ntpoly_tpu.solvers.squareroot",
    "TrigonometrySolvers": "ntpoly_tpu.solvers.trigonometry",
    "Analysis": "ntpoly_tpu.solvers.analysis",
    "ChebyshevPolynomial": "ntpoly_tpu.solvers.chebyshev",
    "HermitePolynomial": "ntpoly_tpu.solvers.hermite",
    "Polynomial": "ntpoly_tpu.solvers.polynomial",
    "EigenBounds": "ntpoly_tpu.solvers.eigenbounds",
    "MatrixMapper": "ntpoly_tpu.utils.maps",
    "MatrixConversion": "ntpoly_tpu.utils.maps",
    "SolverParameters": "ntpoly_tpu.solvers.parameters",
    "Permutation": "ntpoly_tpu.utils.permutation",
    "ProcessGrid": "ntpoly_tpu.parallel.grid",
    "Matrix_ps": "ntpoly_tpu.parallel.pmatrix",
    "ComplexEmbedding": "ntpoly_tpu.core.cplx",
}


def _doc(obj) -> str:
    return inspect.getdoc(obj) or ""


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def render_entry(name, obj) -> str:
    out = [f"## `{name}`\n"]
    doc = _doc(obj)
    if doc:
        out.append(doc + "\n")
    if name in IMPL_MODULES:
        import importlib
        mod = importlib.import_module(IMPL_MODULES[name])
        mdoc = _doc(mod)
        if mdoc:
            out.append(f"*Implementation: `{IMPL_MODULES[name]}`*\n")
            out.append(mdoc + "\n")
    if inspect.isclass(obj):
        members = [(n, m) for n, m in inspect.getmembers(obj)
                   if not n.startswith("_")
                   and (inspect.isfunction(m) or inspect.ismethod(m)
                        or isinstance(m, staticmethod))]
        for n, m in members:
            fn = m.__func__ if isinstance(m, staticmethod) else m
            out.append(f"### `{name}.{n}{_sig(fn)}`\n")
            d = _doc(fn)
            if d:
                out.append(d + "\n")
    elif callable(obj):
        out[0] = f"## `{name}{_sig(obj)}`\n"
    return "\n".join(out)


def generate(outdir: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import ntpoly_tpu as nt

    os.makedirs(outdir, exist_ok=True)
    written = {}
    index = ["# ntpoly_tpu API Reference\n",
             "Generated from live docstrings by `docs/gen_api.py` (the "
             "role of the reference's Ford/Doxygen/Sphinx pipeline, "
             "Documentation/Makefile).\n"]
    for page, names in PAGES.items():
        parts = [f"# {TITLES[page]}\n"]
        found = []
        for name in names:
            obj = getattr(nt, name, None)
            if obj is None:
                continue
            found.append(name)
            parts.append(render_entry(name, obj))
        path = os.path.join(outdir, f"{page}.md")
        with open(path, "w") as f:
            f.write("\n".join(parts))
        written[page] = found
        index.append(f"- [{TITLES[page]}]({page}.md) — "
                     + ", ".join(f"`{n}`" for n in found))
    with open(os.path.join(outdir, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(__file__), "api")
    pages = generate(out)
    total = sum(len(v) for v in pages.values())
    print(f"wrote {len(pages)} pages, {total} entries -> {out}")
