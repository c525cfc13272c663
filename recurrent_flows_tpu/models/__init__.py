from .rfn import RFN
from .srnn import SRNN
from .vrnn import VRNN
from .svg import SVG

__all__ = ["RFN", "SRNN", "VRNN", "SVG"]
