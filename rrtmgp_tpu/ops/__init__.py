from . import rte
