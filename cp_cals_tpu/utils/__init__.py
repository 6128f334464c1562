from .lsap import solve_lsap
