"""Generate Markdown API docs for graphlearning_tpu (reference uses pdoc3,
``generate_docs.sh``; pdoc is not available in this image, so this walks the
package with ``inspect`` and emits one .md per module).

Usage: python docs/generate_docs.py
"""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    "graphlearning_tpu",
    "graphlearning_tpu.core.sparse",
    "graphlearning_tpu.core.graphclass",
    "graphlearning_tpu.ops.graphops",
    "graphlearning_tpu.ops.pallas_spmm",
    "graphlearning_tpu.ops.accel",
    "graphlearning_tpu.ops.gather",
    "graphlearning_tpu.solvers.cg",
    "graphlearning_tpu.solvers.eig",
    "graphlearning_tpu.solvers.eikonal",
    "graphlearning_tpu.solvers.plaplace",
    "graphlearning_tpu.solvers.pagerank",
    "graphlearning_tpu.solvers.kmeans",
    "graphlearning_tpu.solvers.volume",
    "graphlearning_tpu.weightmatrix",
    "graphlearning_tpu.ssl",
    "graphlearning_tpu.clustering",
    "graphlearning_tpu.active_learning",
    "graphlearning_tpu.ars",
    "graphlearning_tpu.datasets",
    "graphlearning_tpu.trainsets",
    "graphlearning_tpu.utils",
    "graphlearning_tpu.parallel.mesh",
    "graphlearning_tpu.parallel.shard",
    "graphlearning_tpu.parallel.execute",
    "graphlearning_tpu.parallel.band_shard",
    "graphlearning_tpu.observability",
    "graphlearning_tpu.checkpoint",
    "graphlearning_tpu.aot",
    "graphlearning_tpu.config",
]

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "api")


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent=""):
    d = inspect.getdoc(obj)
    if not d:
        return ""
    return "\n".join(indent + ln for ln in d.splitlines()) + "\n"


def document(modname):
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", "", _doc(mod)]
    members = [(n, o) for n, o in vars(mod).items() if not n.startswith("_")]
    for name, obj in members:
        if inspect.isclass(obj) and obj.__module__ == modname:
            lines += [f"## class `{name}{_sig(obj)}`", "", _doc(obj), ""]
            for mname, m in vars(obj).items():
                if mname.startswith("_") or not callable(m):
                    continue
                fn = m.__func__ if isinstance(m, (staticmethod, classmethod)) else m
                lines += [f"### `{name}.{mname}{_sig(fn)}`", "",
                          _doc(fn, "    "), ""]
        elif inspect.isfunction(obj) and obj.__module__ == modname:
            lines += [f"## `{name}{_sig(obj)}`", "", _doc(obj), ""]
    return "\n".join(lines)


def main():
    os.makedirs(OUT, exist_ok=True)
    index = ["# graphlearning_tpu API reference", ""]
    for modname in MODULES:
        fname = modname.replace(".", "_") + ".md"
        with open(os.path.join(OUT, fname), "w") as fh:
            fh.write(document(modname))
        index.append(f"- [{modname}]({fname})")
        print("wrote", fname)
    with open(os.path.join(OUT, "index.md"), "w") as fh:
        fh.write("\n".join(index) + "\n")


if __name__ == "__main__":
    main()
