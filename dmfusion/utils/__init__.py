from dmfusion.utils.misc import (  # noqa: F401
    data_show,
    mutual_information,
    parse_switch,
    seed_everything,
)
from dmfusion.utils.h5cache import read_h5, save_h5  # noqa: F401
