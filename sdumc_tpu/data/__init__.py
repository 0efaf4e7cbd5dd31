from sdumc_tpu.data.labels import read_names_labels, TOO_LONG_TRAIN_CLIPS  # noqa: F401
from sdumc_tpu.data.collate import Batch, make_batch, mapping_feature  # noqa: F401
from sdumc_tpu.data.feature_store import NpyDirSource, SyntheticSource  # noqa: F401
from sdumc_tpu.data.pipeline import MoseiDataset, build_loaders  # noqa: F401
