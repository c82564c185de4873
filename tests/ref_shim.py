"""Import shim for running the reference's NNX modules in this environment.

The reference (mounted read-only at /root/reference) imports jraph and
xarray at module scope; only jraph.segment_sum is actually exercised by the
GNN/transformer modules, and xarray appears in type hints. Stubbing both
lets us instantiate the reference's networks to (a) validate the checkpoint
translator and (b) assert numerical parity of our redesigned modules with
translated weights.
"""

import sys
import types

import jax

REFERENCE_ROOT = '/root/reference'


def install():
  # The reference predates flax 0.12's pytree-module rules (it stores
  # plain dicts/lists of submodules); restore the old semantics. Our own
  # modules use nnx.Dict/nnx.List and work under either setting.
  import flax
  flax.config.update('flax_pytree_module', False)

  if 'jraph' not in sys.modules:
    jraph = types.ModuleType('jraph')
    jraph.segment_sum = (
        lambda data, segment_ids, num_segments=None, **kw:
        jax.ops.segment_sum(data, segment_ids, num_segments=num_segments))
    for n in ('ArrayTree', 'AggregateEdgesToNodesFn',
              'AggregateNodesToGlobalsFn', 'AggregateEdgesToGlobalsFn',
              'NodeFeatures', 'GraphsTuple'):
      setattr(jraph, n, object)
    sys.modules['jraph'] = jraph
  if 'xarray' not in sys.modules:
    # Rich enough for the reference's module-scope usage (type hints,
    # pytree registration of the classes); no xarray objects ever flow
    # through the parity tests.
    class _AutoModule(types.ModuleType):
      def __getattr__(self, name):
        sub = _AutoModule(f'{self.__name__}.{name}')
        setattr(self, name, sub)
        return sub

    xr = _AutoModule('xarray')

    class _Coord:
      def __init__(self, data):
        import numpy as np
        self.data = np.asarray(data)

    class _MiniArray:
      """Just enough DataArray for the reference's non-xarray code paths
      (e.g. solar_radiation's TSI table: .data + .coords[name].data)."""

      def __init__(self, data=None, dims=None, coords=None, **_):
        import numpy as np
        self.data = None if data is None else np.asarray(data)
        self.dims = dims
        self.coords = {k: _Coord(v) for k, v in (coords or {}).items()}

    class _MiniVariable:
      """Just enough xarray.Variable for data_utils.featurize_progress
      (positional (dims, data) construction + .dims/.data reads)."""

      def __init__(self, dims=None, data=None, **_):
        import numpy as np
        self.dims = dims
        self.data = None if data is None else np.asarray(data)

    xr.DataArray = _MiniArray
    xr.Variable = _MiniVariable
    for n in ('Dataset', 'IndexVariable'):
      setattr(xr, n, type(n, (), {}))
    xr.apply_ufunc = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError('xarray stub'))
    coords_mod = _AutoModule('xarray.core.coordinates')
    coords_mod.Coordinates = type('Coordinates', (), {})
    xr.core.coordinates = coords_mod
    sys.modules['xarray'] = xr
  if 'dinosaur' not in sys.modules:
    # gencast/samplers_utils.py imports dinosaur.spherical_harmonic at
    # module scope (used only inside noise-sampling calls the parity tests
    # never make); a bare module object satisfies the import.
    dino = types.ModuleType('dinosaur')
    sh = types.ModuleType('dinosaur.spherical_harmonic')
    sh.Grid = type('Grid', (), {})
    dino.spherical_harmonic = sh
    sys.modules['dinosaur'] = dino
    sys.modules['dinosaur.spherical_harmonic'] = sh
  if 'trimesh' not in sys.modules:
    # Back the reference's containing-triangle query with our own
    # implementation (graph/connectivity.py), so both sides build the
    # same mesh2grid edges.
    tm = types.ModuleType('trimesh')

    class _Trimesh:
      def __init__(self, vertices, faces):
        import numpy as np
        from gencast_tpu.graph.icosahedron import TriMesh
        self.mesh = TriMesh(vertices=np.asarray(vertices),
                            faces=np.asarray(faces))

    def _closest_point(mesh, points):
      from gencast_tpu.graph import connectivity
      faces = connectivity.containing_triangle(points, mesh.mesh)
      return None, None, faces

    tm.Trimesh = _Trimesh
    tm.proximity = types.SimpleNamespace(closest_point=_closest_point)
    sys.modules['trimesh'] = tm
  if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)
