"""`python -m meepoembedding_tpu <cmd>` (SURVEY.md C20, L7)."""

import os
import sys

# Honor JAX_PLATFORMS BEFORE any package import can initialize a backend:
# plugin-registered backends (e.g. a tunneled TPU) can prepend themselves to
# the platform list and win selection even when the env var names "cpu".
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

from meepoembedding_tpu.cli import main  # noqa: E402

sys.exit(main())
