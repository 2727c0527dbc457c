import pytest

from hpctoolkit_dataframe_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hpctoolkit-dataframe-spark-tests")
    yield s


SF_DIR = "/root/testdata/sf0.001"
EXPERIMENT1 = "/root/reference/test/data/experiment1.xml"
EXPERIMENT2 = "/root/reference/test/data/experiment2.xml"
