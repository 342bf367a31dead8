from use_tpu.models.gan import losses  # noqa: F401
from use_tpu.models.gan.discriminators import (  # noqa: F401
    HifiganVocoderDiscriminator24k,
    HifiganVocoderDiscriminator24kMVD,
    MelspecDiscriminator,
    MultiMelSpecDiscriminator,
    MultiPeriodDiscriminator,
    MultiWaveDiscriminator,
    PeriodDiscriminator,
    WaveDiscriminator,
)
from use_tpu.models.gan.generator import NCSNPPWrapper  # noqa: F401
from use_tpu.models.gan.lsgan import LSGAN  # noqa: F401
from use_tpu.models.gan.msd import MultiScaleDiscriminator, ScaleDiscriminator  # noqa: F401
from use_tpu.models.gan.csmgan import (  # noqa: F401
    CSMGAN,
    CSMGANStream,
    CSMGANWrapper,
)
from use_tpu.models.gan.hifigan_bwe import BandwidthExtender, WaveNet  # noqa: F401
from use_tpu.models.gan.hifigan_vocoder import HifiganGenerator  # noqa: F401
from use_tpu.models.gan.spec_discriminator import (  # noqa: F401
    MultiSpecDiscriminator,
    SpecDiscriminator,
)
