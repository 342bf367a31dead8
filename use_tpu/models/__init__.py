"""Model families. Importing this package populates the registries."""
from use_tpu.models.registry import (
    BackboneRegistry,
    CorrectorRegistry,
    DiscriminatorRegistry,
    GeneratorRegistry,
    PredictorRegistry,
    SDERegistry,
)

# registration side effects
from use_tpu.models.ncsnpp import ncsnpp as _ncsnpp  # noqa: F401
from use_tpu.models.sgmse import sdes as _sdes  # noqa: F401
from use_tpu.models.sgmse import sampling as _sampling  # noqa: F401
from use_tpu.models import gagnet as _gagnet  # noqa: F401
from use_tpu.models import convtasnet as _convtasnet  # noqa: F401

__all__ = [
    "BackboneRegistry",
    "SDERegistry",
    "PredictorRegistry",
    "CorrectorRegistry",
    "GeneratorRegistry",
    "DiscriminatorRegistry",
]
