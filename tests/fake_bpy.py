"""A minimal fake of the `bpy` / `mathutils` API surface that
`data_gen_tpu/nerf_synth_render.py` drives, so the Blender-Cycles body
(reference data_gen/nerf_synth/render.py:113-247) can execute end to
end in CI without Blender (VERDICT r2 next-round #5).

The fake models scenes as plain-Python object graphs and implements
`bpy.ops.render.render` by writing deterministic pixel data: PNGs for
composite renders (color keyed to the active lighting so env / HDR /
OLAT renders are distinguishable) and 32-bit EXRs through compositor
FileOutput nodes for lighting/normal passes (via the repo's own EXR
codec). Everything Cycles actually computes -- light transport -- is
out of scope and enumerated in PARITY.md.
"""

import os
from os.path import join

import numpy as np

# Deterministic pass payloads the tests assert against
DIFFUSE_COLOR = (0.6, 0.3, 0.2)
GLOSSY_COLOR = (0.1, 0.1, 0.1)
NORMAL_VALUE = (0.0, 0.0, 1.0)
ENV_RENDER_COLOR = (0.8, 0.7, 0.6)
OLAT_RENDER_COLOR = (0.3, 0.2, 0.1)


# ---------------------------------------------------------------- mathutils

class Vector:
    def __init__(self, seq):
        self.v = np.asarray(seq, float)

    def __iter__(self):
        return iter(self.v.tolist())

    def __getitem__(self, i):
        return self.v[i]


class Matrix:
    def __init__(self, mat):
        self.m = np.asarray(mat, float).reshape(4, 4)

    def __matmul__(self, other):
        if isinstance(other, Vector):
            out = self.m @ np.append(other.v, 1.0)
            return Vector(out[:3] / out[3])
        return Matrix(self.m @ other.m)


# ---------------------------------------------------------------- datablocks

class _CameraData:
    def __init__(self):
        self.sensor_width = 36.0
        self.sensor_height = 24.0
        self.lens = 50.0


class _Polygon:
    def __init__(self):
        self.use_smooth = False


class _MeshData:
    def __init__(self):
        self.polygons = [_Polygon() for _ in range(4)]


class _LightData:
    def __init__(self, name, type='POINT'):
        self.name = name
        self.type = type
        self.energy = 0.0


class _MatNode:
    def __init__(self, type):
        self.type = type


class _NodeContainer:
    def __init__(self, nodes=()):
        self._nodes = list(nodes)

    def __iter__(self):
        return iter(list(self._nodes))

    def clear(self):
        self._nodes = []

    def append(self, n):
        self._nodes.append(n)


class _Material:
    def __init__(self, node_types=('BSDF_PRINCIPLED',)):
        self.node_tree = type('NT', (), {})()
        self.node_tree.nodes = _NodeContainer(
            [_MatNode(t) for t in node_types])


class Object:
    def __init__(self, name, type='MESH', data=None, material=None):
        self.name = name
        self.type = type
        self.data = data
        self.active_material = material
        self.matrix_world = Matrix(np.eye(4))
        self.hide_render = False
        self.location = (0.0, 0.0, 0.0)
        self.scale = (1.0, 1.0, 1.0)


class _Collection:
    def __init__(self, objects):
        self._objects = objects

    def __iter__(self):
        return iter(list(self._objects))

    def __getitem__(self, name):
        for o in self._objects:
            if o.name == name:
                return o
        raise KeyError(name)

    def new(self, name, data):
        if isinstance(data, _LightData):
            obj = Object(name, type='LIGHT', data=data)
        else:
            obj = Object(name, type='MESH', data=data)
        return obj  # linked separately via collection.objects.link

    def remove(self, obj):
        self._objects.remove(obj)


class _Lights:
    def new(self, name, type='POINT'):
        return _LightData(name, type=type)


class _Images:
    def __init__(self):
        self.loaded = []

    def load(self, path):
        self.loaded.append(path)
        return type('Image', (), {'filepath': path})()


# ------------------------------------------------------------- compositing

class _Socket:
    def __init__(self, node, name):
        self.node = node
        self.name = name


class _SocketMap(dict):
    pass


class _Node:
    _counter = [0]

    def __init__(self, bl_idname):
        self.bl_idname = bl_idname
        self._counter[0] += 1
        names = {'CompositorNodeRLayers': 'Render Layers',
                 'CompositorNodeSetAlpha': 'Set Alpha',
                 'CompositorNodeOutputFile': 'File Output',
                 'ShaderNodeBackground': 'Background',
                 'ShaderNodeOutputWorld': 'World Output',
                 'ShaderNodeTexEnvironment': 'Environment Texture'}
        base = names.get(bl_idname, bl_idname)
        self.name = base if bl_idname == 'CompositorNodeRLayers' \
            else '%s.%03d' % (base, self._counter[0])
        self.inputs = _SocketMap()
        self.outputs = _SocketMap()
        if bl_idname == 'CompositorNodeRLayers':
            for s in ('Image', 'Alpha', 'DiffCol', 'GlossCol', 'Normal'):
                self.outputs[s] = _Socket(self, s)
        elif bl_idname == 'CompositorNodeSetAlpha':
            for s in ('Image', 'Alpha'):
                self.inputs[s] = _Socket(self, s)
            self.outputs['Image'] = _Socket(self, 'Image')
        elif bl_idname == 'CompositorNodeOutputFile':
            self.inputs['Image'] = _Socket(self, 'Image')
            self.base_path = ''
            self.format = type('Fmt', (), {
                'file_format': 'OPEN_EXR', 'color_depth': '32',
                'color_mode': 'RGBA'})()
        elif bl_idname == 'ShaderNodeBackground':
            self.inputs['Strength'] = _ValueSocket()
            self.inputs['Color'] = _ValueSocket()
            self.outputs['Background'] = _Socket(self, 'Background')
        elif bl_idname == 'ShaderNodeOutputWorld':
            self.inputs['Surface'] = _Socket(self, 'Surface')
        elif bl_idname == 'ShaderNodeTexEnvironment':
            self.image = None
            self.outputs['Color'] = _Socket(self, 'Color')


class _ValueSocket:
    def __init__(self):
        self.default_value = None


class _Links:
    def __init__(self):
        self.links = []

    def new(self, from_socket, to_socket):
        self.links.append((from_socket, to_socket))

    def source_of(self, to_socket):
        for f, t in self.links:
            if t is to_socket:
                return f
        return None


class _Nodes:
    """dict-like by node name + new()/remove()/iteration, as the body
    uses scene.node_tree.nodes."""

    def __init__(self):
        self._nodes = []

    def new(self, bl_idname):
        n = _Node(bl_idname)
        self._nodes.append(n)
        return n

    def remove(self, node):
        self._nodes.remove(node)

    def clear(self):
        self._nodes = []

    def __iter__(self):
        return iter(list(self._nodes))

    def __contains__(self, name):
        return any(n.name == name for n in self._nodes)

    def __getitem__(self, name):
        for n in self._nodes:
            if n.name == name:
                return n
        raise KeyError(name)


class _NodeTree:
    def __init__(self):
        self.nodes = _Nodes()
        self.links = _Links()


# ------------------------------------------------------------------- scene

class _World:
    def __init__(self):
        self.use_nodes = False
        self.node_tree = _NodeTree()


class _Render:
    def __init__(self):
        self.resolution_x = 64
        self.resolution_y = 64
        self.film_transparent = False
        self.filepath = ''
        self.engine = 'CYCLES'


class _Cycles:
    def __init__(self):
        self.samples = 128


class _ViewLayer:
    def __init__(self):
        self.use_pass_diffuse_color = False
        self.use_pass_glossy_color = False
        self.use_pass_normal = False

    def update(self):
        pass


class _Scene:
    def __init__(self):
        self.world = _World()
        self.render = _Render()
        self.cycles = _Cycles()
        self.camera = None
        self._use_nodes = False
        self.node_tree = _NodeTree()

    @property
    def use_nodes(self):
        return self._use_nodes

    @use_nodes.setter
    def use_nodes(self, val):
        self._use_nodes = val
        if val and 'Render Layers' not in self.node_tree.nodes:
            self.node_tree.nodes.new('CompositorNodeRLayers')


# -------------------------------------------------------------------- bpy

class _OpsWm:
    def __init__(self, bpy):
        self._bpy = bpy

    def open_mainfile(self, filepath=None):
        self._bpy._open_scene(filepath)


class _OpsObject:
    def __init__(self, bpy):
        self._bpy = bpy

    def delete(self, ctx=None):
        for o in list((ctx or {}).get('selected_objects', [])):
            if o in self._bpy.data.objects._objects:
                self._bpy.data.objects._objects.remove(o)


class _OpsMesh:
    def __init__(self, bpy):
        self._bpy = bpy

    def primitive_uv_sphere_add(self, radius=1.0, location=(0, 0, 0)):
        obj = Object('Sphere', type='MESH', data=_MeshData())
        obj.location = tuple(location)
        obj.scale = (radius,) * 3
        self._bpy.data.objects._objects.append(obj)
        self._bpy.context.object = obj


class _OpsRender:
    def __init__(self, bpy):
        self._bpy = bpy

    def render(self, write_still=False):
        bpy = self._bpy
        scene = bpy.context.scene
        h, w = scene.render.resolution_y, scene.render.resolution_x
        outnodes = [n for n in scene.node_tree.nodes
                    if n.bl_idname == 'CompositorNodeOutputFile'] \
            if scene.use_nodes else []
        if outnodes:
            # Pass render: trace the link chain back to the RLayers
            # socket to learn WHICH pass feeds the file output
            from nerfactor_tpu.utils import exr as exrutil
            links = scene.node_tree.links
            for outnode in outnodes:
                src = links.source_of(outnode.inputs['Image'])
                if src is not None and \
                        src.node.bl_idname == 'CompositorNodeSetAlpha':
                    src = links.source_of(src.node.inputs['Image'])
                assert src is not None, "FileOutput node not linked"
                value = {'DiffCol': DIFFUSE_COLOR,
                         'GlossCol': GLOSSY_COLOR,
                         'Normal': NORMAL_VALUE}[src.name]
                assert getattr(
                    bpy.context.view_layer, 'use_pass_' + {
                        'DiffCol': 'diffuse_color',
                        'GlossCol': 'glossy_color',
                        'Normal': 'normal'}[src.name]), \
                    "pass rendered without enabling it on the view layer"
                img = np.empty((h, w, 3), np.float32)
                img[:] = value
                os.makedirs(outnode.base_path, exist_ok=True)
                exrutil.write_exr(join(outnode.base_path, '0001.exr'),
                                  img, pixel_type=np.float32)
            return
        # Composite render -> PNG at scene.render.filepath, color keyed
        # to the lighting state so env/HDR/OLAT outputs are distinct
        import imageio.v2 as imageio
        point_lights = [o for o in bpy.data.objects if o.type == 'LIGHT']
        world_nodes = list(bpy.context.scene.world.node_tree.nodes) \
            if bpy.context.scene.world.use_nodes else []
        env_node = next((n for n in world_nodes
                         if n.bl_idname == 'ShaderNodeTexEnvironment'),
                        None)
        if point_lights:
            color = OLAT_RENDER_COLOR
        elif env_node is not None:
            # Key the color to the env filename so different HDRs give
            # different renders
            seed = sum(ord(c) for c in
                       os.path.basename(env_node.image.filepath)) % 97
            base = np.asarray(ENV_RENDER_COLOR)
            color = tuple(np.clip(base * (0.5 + seed / 97.0), 0, 1))
        else:
            color = (0.0, 0.0, 0.0)
        img = np.empty((h, w, 4), np.float32)
        img[:, :, :3] = color
        img[:, :, 3] = 1.0
        path = scene.render.filepath
        if not path.endswith('.png'):
            path = path + '.png'
        os.makedirs(os.path.dirname(path), exist_ok=True)
        imageio.imwrite(path, (img * 255).astype(np.uint8))


class _Ops:
    def __init__(self, bpy):
        self.wm = _OpsWm(bpy)
        self.object = _OpsObject(bpy)
        self.mesh = _OpsMesh(bpy)
        self.render = _OpsRender(bpy)


class _Data:
    def __init__(self):
        self.objects = _Collection([])
        self.lights = _Lights()
        self.images = _Images()


class _Context:
    def __init__(self):
        self.scene = _Scene()
        self.view_layer = _ViewLayer()
        self.object = None
        self.collection = type('Coll', (), {})()


class FakeBpy:
    """Importable stand-in for the `bpy` module."""

    def __init__(self):
        self.data = _Data()
        self.context = _Context()
        self.ops = _Ops(self)
        _outer = self

        class _CollObjs:
            def link(self, obj):
                if obj not in _outer.data.objects._objects:
                    _outer.data.objects._objects.append(obj)

        self.context.collection.objects = _CollObjs()
        self.opened_scenes = []

    def _open_scene(self, filepath):
        """Builds the canonical test scene: a camera, a mesh, and the
        clutter render_view must strip (empties, background plane,
        lights, an emissive mesh)."""
        self.opened_scenes.append(filepath)
        objs = [
            Object('Camera', type='CAMERA', data=_CameraData()),
            Object('Lego', type='MESH', data=_MeshData(),
                   material=_Material()),
            Object('Empty.001', type='EMPTY'),
            Object('BackgroundPlane', type='MESH', data=_MeshData()),
            Object('Sun', type='LIGHT', data=_LightData('Sun', 'SUN')),
            Object('Glow', type='MESH', data=_MeshData(),
                   material=_Material(('EMISSION',))),
        ]
        self.data.objects = _Collection(objs)
        self.context.scene = _Scene()


def install(monkeypatch):
    """Installs fresh fake `bpy`/`mathutils` modules into sys.modules
    and reloads nerf_synth_render against them. Returns (module, bpy)."""
    import importlib
    import sys
    import types

    fake = FakeBpy()
    bpy_mod = types.ModuleType('bpy')
    for attr in ('data', 'context', 'ops'):
        setattr(bpy_mod, attr, getattr(fake, attr))
    bpy_mod._fake = fake
    mathutils_mod = types.ModuleType('mathutils')
    mathutils_mod.Matrix = Matrix
    mathutils_mod.Vector = Vector
    monkeypatch.setitem(sys.modules, 'bpy', bpy_mod)
    monkeypatch.setitem(sys.modules, 'mathutils', mathutils_mod)
    from data_gen_tpu import nerf_synth_render
    module = importlib.reload(nerf_synth_render)
    assert module.HAS_BPY
    return module, fake
