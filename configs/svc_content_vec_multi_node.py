# Multi-node ContentVec SVC (reference configs/svc_content_vec_multi_node.py).
#
# TPU-native distribution: instead of Lightning num_nodes/devices, the mesh
# spans slices — run one process per host with jax.distributed.initialize();
# the `data` axis covers all chips (ICI within slice, DCN across).

_base_ = ["./svc_content_vec.py"]

trainer = dict(
    max_steps=100_000,
    # informational: the mesh is built from jax.devices() at runtime;
    # 6 nodes x 8 chips in the reference example
    num_nodes=6,
    devices=8,
)

dataset = dict(
    train=dict(type="NaiveSVCDataset", path="dataset/train", speaker_id=0),
    valid=dict(type="NaiveSVCDataset", path="dataset/valid", speaker_id=0),
)
