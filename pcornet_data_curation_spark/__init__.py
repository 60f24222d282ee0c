"""pcornet_data_curation_spark — a from-scratch PySpark-native webtext
quality-curation engine.

Re-expresses the capability classes of the PCORnet Data Curation query
package (reference: /root/reference/DC Query Package v7.03, SAS) as an
idiomatic Spark pipeline over Common-Crawl-style web pages:

* per-record rule validation  -> Gopher/C4-style heuristic rule engine
  (reference: potential_code_errors.sas:320-344 rule-flag blocks)
* keep/drop verdict + violation rows   (potential_code_errors.sas:343)
* text scrubbing (regex PII/toxicity)
* conformance / value-distribution reporting
  (%tag/%cont/%t_cont/%n_pct family, data_curation_base.sas:121-2782)
* metrics normalization (normalization.sas) + threshold data checks
  (edc_report.sas)
* per-stage lineage (%elapsed, data_curation_base.sas:2894-2995) and
  checkpoint/resume per partition.

Everything is DataFrame transforms + vectorized pandas/Arrow UDFs —
no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"

from pcornet_data_curation_spark.config import PipelineConfig  # noqa: F401
from pcornet_data_curation_spark.session import get_spark  # noqa: F401
