from . import diagnostics
from .diagnostics import (PhaseTimer, convergence_info, filter_quality,
                          print_convergence_info)
