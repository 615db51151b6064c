from .columns import ColumnBatch, make_mesh
