from tsdiff_tpu.data.dataset import (  # noqa: F401
    PaddedBatchLoader,
    TSDataset,
    default_buckets,
    inf_iterator,
    load_dataset,
    save_dataset,
)
from tsdiff_tpu.data.featurize import (  # noqa: F401
    DEFAULT_FEATURES,
    default_feat_dict,
    featurize_smarts_list,
    generate_ts_data,
    one_hot_features,
)
from tsdiff_tpu.data.splits import index_split, random_split  # noqa: F401
