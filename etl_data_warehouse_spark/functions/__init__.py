from .numeric import dec, dsum, davg, wsum_over, wavg_over  # noqa: F401
from .datetime_utils import (  # noqa: F401
    date_key,
    day_name,
    month_name,
    weekday0,
    is_weekend,
)
