"""Image stack IO (TIFF via imageio/PIL, npz) and iteration checkpointing."""
