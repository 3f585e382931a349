import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4 oracle (d)).
os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may pre-set a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
# 8 mesh device threads share this host's single CPU core; under load the
# cross-device all-reduce rendezvous can exceed XLA's default terminate
# watchdog, which kills the whole process with SIGABRT ("Termination timeout
# ... Exiting to ensure a consistent program state"). Raise it far above any
# legitimate stall.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start; backends initialise lazily, so overriding the config here (before any
# jax computation) pins the suite to the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite is dominated by 3D-CNN compiles,
# which are identical across runs (cache keys include platform/device count,
# so CPU-mesh test entries don't collide with TPU entries).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
LENS_RF50 = f"{REFERENCE_DIR}/lenses/rf50mm/lens.json"
LENS_50F28 = f"{REFERENCE_DIR}/lenses/50mm_f2.8/lens.json"
GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "optics_goldens.npz")


@pytest.fixture(scope="session")
def rf50mm():
    from aadff_tpu.optics import Lens

    return Lens(LENS_RF50, sensor_res=(480, 640))


@pytest.fixture(scope="session")
def goldens():
    import numpy as np

    return np.load(GOLDENS)


def import_reference(module: str):
    """Import a module from the torch reference with its unavailable deps
    (torchvision/skimage/lpips) stubbed — `deeplens/__init__` imports them
    transitively."""
    import importlib
    import sys
    import types

    for name in [
        "skimage", "skimage.metrics", "skimage.morphology",
        "skimage.filters", "lpips",
        "torchvision", "torchvision.utils", "torchvision.transforms",
        "torchvision.transforms.functional", "torchvision.models",
    ]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["skimage.metrics"].peak_signal_noise_ratio = lambda *a, **k: 0
    sys.modules["skimage.metrics"].structural_similarity = lambda *a, **k: 0
    sys.modules["skimage.morphology"].disk = lambda *a, **k: None
    sys.modules["skimage.morphology"].closing = lambda *a, **k: None
    sys.modules["torchvision.utils"].save_image = lambda *a, **k: None
    sys.modules["torchvision.utils"].make_grid = lambda *a, **k: None
    if not hasattr(sys.modules["lpips"], "LPIPS"):
        sys.modules["lpips"].LPIPS = type("LPIPS", (), {"__init__": lambda self, *a, **k: None})
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    return importlib.import_module(module)
