"""CLI entry points.

Importing this package applies the ``ZIPVOICE_PLATFORM`` environment
override (e.g. ``ZIPVOICE_PLATFORM=cpu``) before any CLI touches a JAX
backend.  This exists because ``JAX_PLATFORMS`` can be defeated by a
site-customization that force-registers an accelerator plugin at
interpreter start (the documented failure mode of this dev image):
``jax.config.update("jax_platforms", ...)`` after import still wins, so
the CLIs route the choice through here.  CPU-drives of the training /
inference CLIs (tests, smoke verification, machines without the
accelerator attached) set it; production leaves it unset.
"""

import os

_platform = os.environ.get("ZIPVOICE_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)
