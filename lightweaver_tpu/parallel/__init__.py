from .columns import ColumnBatch, make_mesh
from .multihost import (global_mesh, initialize_multihost,
                        local_column_slice, make_global_array)
from .xshard2d import formal_sol_2d_xsharded
