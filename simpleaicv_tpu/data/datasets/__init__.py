from .cifar import CIFAR10Dataset, CIFAR100Dataset  # noqa: F401
from .synthetic import FakeClassificationDataset  # noqa: F401
from .ilsvrc2012 import ILSVRC2012Dataset  # noqa: F401
