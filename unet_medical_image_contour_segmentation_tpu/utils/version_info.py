"""Runtime version report (parity: reference utils/torch_version.py)."""

from __future__ import annotations


def version_info() -> dict:
    import jax
    import jaxlib

    from .. import __version__

    info = {
        "framework": __version__,
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    try:
        import numpy

        info["numpy"] = numpy.__version__
    except ImportError:
        pass
    return info


if __name__ == "__main__":
    for k, v in version_info().items():
        print(f"{k}: {v}")
