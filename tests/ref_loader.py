"""Load individual reference modules by file path (bypassing package
__init__ files whose imports need packages absent from this image)."""

import importlib.util
import os
import sys

REFERENCE = "/root/reference"


def available() -> bool:
    return os.path.isdir(REFERENCE)


def load_ref_module(relpath: str, name: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REFERENCE, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
