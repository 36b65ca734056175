from sph_tpu.core import quat  # noqa: F401
from sph_tpu.core.types import (  # noqa: F401
    BondTable,
    Genome,
    GenomeDevice,
    GenomeMode,
    PendingSplits,
    SimParams,
    SimState,
)
