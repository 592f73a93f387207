"""Command-line drivers mirroring the reference executables.

| Reference executable       | Driver module                              |
|----------------------------|--------------------------------------------|
| ``BelosMueLuSolver``       | ``...cli.solve``                           |
| ``ExodusIODecomposeTest``  | ``...cli.decompose``                       |
| ``ExodusAssembleTest``     | ``...cli.assemble_test``                   |
| ``ExodusMatrixTest``       | ``...cli.matrix_test``                     |
| ``mpi_output_combiner.py`` | ``...cli.combine``                         |
"""
