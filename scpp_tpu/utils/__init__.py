from scpp_tpu.utils.info_parser import InfoFile, parse_info  # noqa: F401
from scpp_tpu.utils.timing import tic, toc  # noqa: F401
