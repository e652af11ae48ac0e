"""Model zoo: BTS encoders + Dense-ASPP/LPG decoder."""

from bts_tpu.models.bts import BTSModel, ENCODERS, create_model, init_model  # noqa: F401
from bts_tpu.models.decoder import BTSDecoder  # noqa: F401
