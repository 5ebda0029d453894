"""ES Query-DSL compiler — registered REQUEST BODIES (split from es_dsl.py).

Pure JSON-literal `_search` bodies (plus the parent-child relation
declaration and the geo runtime-mapping) exercised by the registry
entries in operators/es_dsl.py. No logic lives here — the facade
re-exports every name, so import from operators.es_dsl as before.
"""

from __future__ import annotations

PERCOLATE_QUERIES = {
    "long_english": {"bool": {"filter": [
        {"term": {"lang": "en"}},
        {"range": {"n_chars": {"gte": 400}}},
    ]}},
    "mentions_merge": {"match": {"text": "merge"}},
    "scan_phrase": {"match_phrase": {"text": "table scan"}},
    "short_or_zh": {"bool": {"should": [
        {"range": {"n_chars": {"lt": 100}}},
        {"term": {"lang": "zh"}},
    ]}},
}
BOOL_FILTER_BODY = {
    "query": {
        "bool": {
            "must": [{"match": {"text": "table scan"}}],
            "filter": [
                {"term": {"lang": "en"}},
                {"range": {"n_chars": {"gte": 100, "lt": 450}}},
            ],
            "must_not": [{"prefix": {"source": "src1"}}],
        }
    },
    "sort": [{"n_chars": {"order": "desc"}}],
    "size": 25,
    "_source": ["doc_id", "lang", "source", "n_chars"],
}
SHOULD_MSM_BODY = {
    "query": {
        "bool": {
            "should": [
                {"match_phrase": {"text": "value table"}},
                {"wildcard": {"source": "src?9"}},
                {"terms": {"lang": ["de", "fr"]}},
            ],
            "minimum_should_match": 2,
        }
    },
    "sort": [{"doc_id": "asc"}],
    "size": 50,
    "_source": ["doc_id", "lang", "source"],
}
TERMS_AGG_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-10"}}},
    "aggs": {
        "by_type": {
            "terms": {"field": "event_type", "size": 10},
            "aggs": {"v": {"stats": {"field": "value"}}},
        }
    },
}
DATE_HISTO_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "v_avg": {"avg": {"field": "value"}},
                "users": {"cardinality": {"field": "user_id"}},
            },
        }
    },
}
NESTED_AGG_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-05"}}},
    "aggs": {
        "by_type": {
            "terms": {"field": "event_type", "size": 3},
            "aggs": {
                "daily": {
                    "date_histogram": {"field": "ts", "calendar_interval": "week"},
                    "aggs": {"v": {"avg": {"field": "value"}}},
                }
            },
        }
    },
}
SIG_TERMS_BODY = {
    "query": {"term": {"lang": "en"}},
    "aggs": {"sig": {"significant_terms": {"field": "text", "size": 10}}},
}
COLLAPSE_BODY = {
    "query": {"range": {"n_chars": {"gte": 100}}},
    "collapse": {"field": "lang"},
    "sort": [{"n_chars": {"order": "desc"}}],
    "_source": ["doc_id", "lang", "source", "n_chars"],
    "size": 10,
}
KNN_BODY = {
    "knn": {
        "field": "embedding",
        # exact 1-dp decimals: identical literals in both dialects
        "query_vector": [((i * 37) % 19 - 9) / 10.0 for i in range(64)],
        "k": 15,
        "num_candidates": 100,  # ES HNSW knob; exact scan ignores it
        "filter": {"range": {"vec_id": {"lt": 400}}},
    }
}
MATCH_SCORED_BODY = {
    # bare match, no sort: ES query context -> BM25 _score ordering
    "query": {"match": {"text": "table scan fast"}},
    "size": 25,
    "_source": ["doc_id", "lang", "n_chars"],
}
SOURCE_FILTERING_BODY = {
    # the _source OBJECT form: includes wildcards resolved against
    # the compile-time column inventory, minus excludes — the
    # response-trimming idiom wide-document deployments rely on
    "query": {"range": {"n_chars": {"gte": 400}}},
    "_source": {"includes": ["doc_id", "lang", "n_*"],
                "excludes": ["text"]},
    "sort": [{"doc_id": "asc"}],
    "size": 40,
}
POST_FILTER_BODY = {
    # the Kibana faceted-search shape: a scored match narrowed by a
    # facet selection via post_filter — hit set filtered, BM25 scores
    # and ranking unchanged for the surviving docs
    "query": {"match": {"text": "table scan fast"}},
    "post_filter": {"term": {"lang": "en"}},
    "size": 25,
    "_source": ["doc_id", "lang", "n_chars"],
}
MULTI_MATCH_BODY = {
    "query": {"multi_match": {
        "query": "merge value batch",
        "fields": ["text", "source"],
        "type": "most_fields",
    }},
    "size": 20,
}
COMPOSITE_AFTER_BODY = {
    "aggs": {"pages": {
        "composite": {
            "sources": [
                {"etype": {"terms": {"field": "event_type"}}},
                {"day": {"date_histogram": {"field": "ts",
                                            "calendar_interval": "day"}}},
            ],
            "size": 15,
            # resume strictly after this key tuple — the scalable
            # pagination idiom (no deep from/size offset)
            "after": {"etype": "purchase", "day": "2024-01-05"},
        },
        "aggs": {"v_sum": {"sum": {"field": "value"}}},
    }},
}
NESTED3_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-03"}}},
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 3},
        "aggs": {"weekly": {
            "date_histogram": {"field": "ts", "calendar_interval": "week"},
            "aggs": {"band": {
                "histogram": {"field": "value", "interval": 25},
                "aggs": {"v": {"avg": {"field": "value"}}},
            }},
        }},
    }},
}
FILTERS_AGG_BODY = {
    "aggs": {"segments": {
        "filters": {"filters": {
            "short": {"range": {"n_chars": {"lt": 150}}},
            "english": {"term": {"lang": "en"}},
            "merge-docs": {"match": {"text": "merge"}},
        }},
        "aggs": {"chars": {"avg": {"field": "n_chars"}}},
    }},
}
TOP_HITS_BODY = {
    "query": {"range": {"n_chars": {"gte": 50}}},
    "aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 3},
        "aggs": {"top": {"top_hits": {
            "size": 2,
            "sort": [{"n_chars": {"order": "desc"}}],
            "_source": ["doc_id", "source", "n_chars"],
        }}},
    }},
}
PIPELINE_AGG_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "v_cum": {"cumulative_sum": {"buckets_path": "v_sum"}},
            "v_diff": {"derivative": {"buckets_path": "v_sum"}},
            "n_cum": {"cumulative_sum": {"buckets_path": "_count"}},
        },
    }},
}
MATCH_AND_BODY = {
    # operator: and — every analyzed term required; still BM25-scored
    "query": {"match": {"text": {"query": "table scan", "operator": "and"}}},
    "size": 20,
}
FUZZY_BODY = {
    # 'scna' is one transposition (two substitutions) from 'scan';
    # AUTO on a 4-char term allows 1 edit, so pin fuzziness: 2
    "query": {"fuzzy": {"text": {"value": "scna", "fuzziness": 2}}},
    "sort": [{"doc_id": "asc"}],
    "size": 30,
    "_source": ["doc_id", "lang", "n_chars"],
}
SEARCH_AFTER_BODY = {
    # deep pagination: resume strictly after (n_chars=350, doc_id=123)
    "query": {"term": {"lang": "en"}},
    "sort": [{"n_chars": {"order": "desc"}}],
    "search_after": [350, 123],
    "size": 20,
    "_source": ["doc_id", "n_chars"],
}
SIBLING_PIPELINE_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v_sum": {"sum": {"field": "value"}}},
        },
        # sibling pipelines: one scalar each over daily's buckets,
        # rendered as constant columns beside the buckets
        "avg_daily": {"avg_bucket": {"buckets_path": "daily>v_sum"}},
        "max_daily": {"max_bucket": {"buckets_path": "daily>v_sum"}},
        "total_docs": {"sum_bucket": {"buckets_path": "daily>_count"}},
    },
}
EXTENDED_STATS_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-04"}}},
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 5},
        "aggs": {"v": {"extended_stats": {"field": "value"}}},
    }},
}
TERMS_ORDER_BODY = {
    # buckets ordered by a sibling metric, not doc_count — the ES
    # terms `order` parameter
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 4,
                  "order": {"v_avg": "desc"}},
        "aggs": {"v_avg": {"avg": {"field": "value"}}},
    }},
}
MATCH_PHRASE_PREFIX_BODY = {
    # adjacency with the last term as a prefix: 'table sc' hits
    # 'table scan', 'table scans', ...
    "query": {"match_phrase_prefix": {"text": "table sc"}},
    "sort": [{"doc_id": "asc"}],
    "size": 40,
    "_source": ["doc_id", "lang", "n_chars"],
}
FIXED_INTERVAL_BODY = {
    "query": {"term": {"event_type": "click"}},
    "aggs": {"h6": {
        "date_histogram": {"field": "ts", "fixed_interval": "6h",
                           "min_doc_count": 2},
        "aggs": {"v_sum": {"sum": {"field": "value"}}},
    }},
}
PRANKS_WAVG_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-03"}}},
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 4},
        "aggs": {
            "ranks": {"percentile_ranks": {
                "field": "value", "values": [25.0, 50.0, 90.0],
            }},
            "wavg": {"weighted_avg": {
                "value": {"field": "value"},
                "weight": {"field": "user_id"},
            }},
        },
    }},
}
BUCKET_SELECTOR_BODY = {
    # the Kibana HAVING idiom: keep only event types whose average
    # value clears a threshold — bucket_selector over terms buckets
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 10},
        "aggs": {
            "v_avg": {"avg": {"field": "value"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"a": "v_avg", "c": "_count"},
                "script": "params.a > 49 && params.c > 10",
            }},
        },
    }},
}
BUCKET_SCRIPT_BODY = {
    # derived per-bucket metric (sum/count scaled) COMPOSED with a
    # window pipeline (cumulative_sum) — scripts layer over the
    # pipeline-wrapped bucket relation
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "week"},
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "running": {"cumulative_sum": {"buckets_path": "v_sum"}},
            "per_doc_pct": {"bucket_script": {
                "buckets_path": {"s": "v_sum", "c": "_count"},
                "script": "(params.s / params.c) * 100",
            }},
        },
    }},
}
MATCH_HIGHLIGHT_BODY = {
    # hits + highlights from ONE body, ES-style: BM25-scored match with
    # first-occurrence <em> snippets computed on the top-k relation
    "query": {"match": {"text": "table scan fast"}},
    "size": 15,
    "_source": ["doc_id", "lang"],
    "highlight": {"fields": {"text": {}}},
}
MULTI_TERMS_BODY = {
    # compound-key terms without composite's pagination semantics
    "query": {"range": {"n_chars": {"gte": 100}}},
    "aggs": {"by_lang_src": {
        "multi_terms": {
            "terms": [{"field": "lang"}, {"field": "source"}],
            "size": 12,
            "min_doc_count": 2,
        },
        "aggs": {"chars_avg": {"avg": {"field": "n_chars"}}},
    }},
}
AUTO_DATE_HISTOGRAM_BODY = {
    # data-chosen interval: 30 days of purchases under a 12-bucket
    # target resolves to weekly buckets via the fixed ladder
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {"auto": {
        "auto_date_histogram": {"field": "ts", "buckets": 12},
        "aggs": {"v_avg": {"avg": {"field": "value"}}},
    }},
}
RARE_TERMS_BODY = {
    # the long tail: document lengths seen at most twice among long docs
    "query": {"range": {"n_chars": {"gte": 300}}},
    "aggs": {"rare_len": {
        "rare_terms": {"field": "n_chars", "max_doc_count": 2},
    }},
}
DATE_RANGE_BODY = {
    # calendar reporting periods with ES from-inclusive/to-exclusive
    # edges and an explicit key label on one bucket
    "query": {"term": {"event_type": "signup"}},
    "aggs": {"period": {
        "date_range": {"field": "ts", "ranges": [
            {"to": "2024-01-08"},
            {"from": "2024-01-08", "to": "2024-01-16"},
            {"from": "2024-01-16", "to": "2024-01-24", "key": "wk3"},
            {"from": "2024-01-24"},
        ]},
        "aggs": {"v_avg": {"avg": {"field": "value"}}},
    }},
}
SERIAL_DIFF_MOVING_BODY = {
    # the time-series smoothing idioms: week-over-week serial_diff and
    # 7-bucket moving average / moving doc-count sum
    "query": {"term": {"event_type": "view"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "wow": {"serial_diff": {"buckets_path": "v_sum", "lag": 7}},
            "ma7": {"moving_fn": {
                "buckets_path": "v_sum", "window": 7,
                "script": "MovingFunctions.unweightedAvg(values)",
            }},
            "docs7": {"moving_fn": {
                "buckets_path": "_count", "window": 7, "shift": 1,
                "script": "MovingFunctions.sum(values)",
            }},
        },
    }},
}
STATS_BUCKET_BODY = {
    # sibling stats over the parent's buckets: the per-day average's
    # spread, and the per-day doc_count's spread, in one response
    "query": {"term": {"event_type": "error"}},
    "aggs": {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v_avg": {"avg": {"field": "value"}}},
        },
        "day_stats": {"stats_bucket": {"buckets_path": "daily>v_avg"}},
        "day_docs": {"stats_bucket": {"buckets_path": "daily>_count"}},
    },
}
TERMS_INCLUDE_BODY = {
    # include regex (Lucene full-match) + exclude list on the bucket
    # key, pushed into the WHERE below the aggregation
    "query": {"range": {"n_chars": {"gte": 50}}},
    "aggs": {"langs": {
        "terms": {"field": "lang", "size": 10,
                  "include": "(en|de|fr|es)", "exclude": ["es"]},
        "aggs": {"chars_avg": {"avg": {"field": "n_chars"}}},
    }},
}
HISTOGRAM_OFFSET_BODY = {
    # offset-shifted numeric buckets: floor((x-off)/step)*step + off
    "query": {"term": {"event_type": "click"}},
    "aggs": {"v_hist": {
        "histogram": {"field": "value", "interval": 50, "offset": 10},
        "aggs": {"n_users": {"cardinality": {"field": "user_id"}}},
    }},
}
REGEXP_BODY = {
    # Lucene full-match regexp on a keyword-ish field
    "query": {"regexp": {"source": "src1[0-9]"}},
    "sort": [{"doc_id": "asc"}],
    "size": 120,
    "_source": ["doc_id", "source", "lang"],
}
TERMS_SET_BODY = {
    # "all 3 of these terms": the dynamic minimum_should_match
    # query, here with the literal-integer script constant
    "query": {"terms_set": {"text": {
        "terms": ["spark", "vector", "stream"],
        "minimum_should_match_script": {"source": "3"},
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 200,
    "_source": ["doc_id", "lang", "n_chars"],
}
SIMPLE_QUERY_STRING_BODY = {
    # the Kibana search bar's safe dialect: | + - "phrase" trailing-*
    "query": {"simple_query_string": {
        "query": '(spark | vector) + "table scan" + -slow*',
        "fields": ["text"],
        "default_operator": "and",
    }},
    "sort": [{"doc_id": "asc"}],
    "size": 200,
    "_source": ["doc_id", "lang", "source"],
}
QUERY_STRING_BODY = {
    # the full Lucene search-bar syntax: field:term, field groups,
    # phrases, [lo TO hi} ranges, comparison shorthand, NOT, wildcards
    "query": {"query_string": {
        "query": (
            'lang:(en OR fr) AND (text:"hash join" OR text:vector) '
            "AND n_chars:[150 TO 450} AND NOT source:src1*"
        ),
        "default_field": "text",
    }},
    "sort": [{"doc_id": "asc"}],
    "size": 200,
    "_source": ["doc_id", "lang", "source", "n_chars"],
}
STRING_STATS_BOXPLOT_BODY = {
    # per-language field-length profile + five-number summary
    "aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 10},
        "aggs": {
            "src_len": {"string_stats": {"field": "source"}},
            "chars_box": {"boxplot": {"field": "n_chars"}},
        },
    }},
    "size": 0,
}
RATE_BODY = {
    # "events per hour" on a 6-hour axis: value rate + doc-count rate
    "query": {"term": {"event_type": "click"}},
    "aggs": {"by6h": {
        "date_histogram": {"field": "ts", "fixed_interval": "6h"},
        "aggs": {
            "value_per_hour": {"rate": {"field": "value", "unit": "hour"}},
            "docs_per_hour": {"rate": {"unit": "hour"}},
        },
    }},
    "size": 0,
}
MAD_BODY = {
    # robust per-language dispersion of document length
    "aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 10},
        "aggs": {"mad_chars": {
            "median_absolute_deviation": {"field": "n_chars"},
        }},
    }},
    "size": 0,
}
NORMALIZE_BODY = {
    # per-language share-of-corpus and rescaled doc counts
    "aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 10},
        "aggs": {
            "total_chars": {"sum": {"field": "n_chars"}},
            "chars_pct": {"normalize": {
                "buckets_path": "total_chars",
                "method": "percent_of_sum",
            }},
            "docs_scaled": {"normalize": {
                "buckets_path": "_count", "method": "rescale_0_100",
            }},
        },
    }},
    "size": 0,
}
BUCKET_SORT_BODY = {
    # "top 3 event types by average value, skipping the biggest":
    # sort + from + size on the returned buckets
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 100},
        "aggs": {
            "v_avg": {"avg": {"field": "value"}},
            "top3": {"bucket_sort": {
                "sort": [{"v_avg": {"order": "desc"}}],
                "from": 1, "size": 3,
            }},
        },
    }},
    "size": 0,
}
PERCENTILES_BUCKET_BODY = {
    # distribution of daily click volume across the month
    "query": {"term": {"event_type": "click"}},
    "aggs": {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v_sum": {"sum": {"field": "value"}}},
        },
        "day_pct": {"percentiles_bucket": {
            "buckets_path": "daily>v_sum", "percents": [25, 50, 75, 99],
        }},
    },
    "size": 0,
}
ADJACENCY_MATRIX_BODY = {
    # co-occurrence counts of three audience segments in one scan
    "aggs": {"segments": {"adjacency_matrix": {"filters": {
        "english": {"term": {"lang": "en"}},
        "long": {"range": {"n_chars": {"gte": 300}}},
        "spark_docs": {"match": {"text": "spark"}},
    }}}},
    "size": 0,
}
SAMPLER_BODY = {
    # profile a bounded sample instead of the full match set
    "query": {"term": {"lang": "en"}},
    "aggs": {"sample": {
        "sampler": {"shard_size": 150},
        "aggs": {
            "chars_avg": {"avg": {"field": "n_chars"}},
            "n_sources": {"cardinality": {"field": "source"}},
        },
    }},
    "size": 0,
}
DIVERSIFIED_SAMPLER_BODY = {
    # the same profile with a per-language diversity cap
    "aggs": {"sample": {
        "diversified_sampler": {
            "field": "lang", "max_docs_per_value": 25, "shard_size": 100,
        },
        "aggs": {
            "chars_avg": {"avg": {"field": "n_chars"}},
            "langs": {"cardinality": {"field": "lang"}},
        },
    }},
    "size": 0,
}
SIGNIFICANT_TEXT_BODY = {
    # tokens over-represented in English docs vs the whole corpus
    "query": {"term": {"lang": "en"}},
    "aggs": {"sig": {"significant_text": {
        "field": "text", "min_doc_count": 3, "size": 10,
    }}},
    "size": 0,
}
FUNCTION_SCORE_BODY = {
    # "relevant AND popular": BM25 over the match, multiplied by a
    # log1p-damped document-length factor — the ES boosting idiom
    "query": {"function_score": {
        "query": {"match": {"text": "table scan fast"}},
        "field_value_factor": {
            "field": "n_chars", "modifier": "log1p", "factor": 0.01,
        },
        "boost_mode": "multiply",
    }},
    "size": 20,
    "_source": ["doc_id", "lang", "n_chars"],
}
FS_DECAY_BODY = {
    # "relevant AND recent": BM25 over the match, exp-decayed by the
    # event's age from an explicit origin (never "now" — deterministic
    # origins are what make recency boosting oracle-checkable). The
    # decay constants fold to literals at compile time, so the curve
    # is identical IEEE arithmetic in both engines.
    "query": {"function_score": {
        "query": {"match": {"event_type": "click"}},
        "exp": {"ts": {
            "origin": "2024-06-01 00:00:00", "scale": "30d",
            "decay": 0.5,
        }},
    }},
    "size": 25,
    "_source": ["event_id", "ts"],
}
FS_FUNCTIONS_BODY = {
    # the full function_score shape real relevance-tuning bodies use:
    # a functions array where each entry is gated by a filter and
    # weighted, combined by score_mode, capped by max_boost, applied
    # by boost_mode — "boost English docs near the target length,
    # slightly prefer shorter docs everywhere"
    "query": {"function_score": {
        "query": {"match": {"text": "table scan fast"}},
        "functions": [
            {"filter": {"term": {"lang": "en"}}, "weight": 2,
             "linear": {"n_chars": {
                 "origin": 400, "scale": 400, "decay": 0.5,
             }}},
            {"exp": {"n_chars": {"origin": 0, "scale": 1000}},
             "weight": 0.5},
        ],
        "score_mode": "sum",
        "boost_mode": "multiply",
        "max_boost": 3,
    }},
    "size": 20,
    "_source": ["doc_id", "lang", "n_chars"],
}
SCRIPT_SCORE_BODY = {
    # custom ranking formula: saturation-damped length prior times the
    # BM25 score, written in the Painless-lite expression grammar
    # (doc[...] refs + params + _score); min_score drops the tail
    "query": {"function_score": {
        "query": {"match": {"text": "table scan"}},
        "script_score": {"script": {
            "source": "_score * (params.w / (params.w"
                      " + doc['n_chars'].value))",
            "params": {"w": 500},
        }},
        "boost_mode": "replace",
        "min_score": 0.1,
    }},
    "size": 20,
    "_source": ["doc_id", "n_chars"],
}
RANDOM_SCORE_BODY = {
    # seeded deterministic shuffle of the match hits — ES's A/B-test /
    # result-rotation idiom; the engine renders it over its
    # md5-uniform primitive so the permutation is cross-engine stable
    "query": {"function_score": {
        "query": {"match": {"text": "table"}},
        "random_score": {"seed": 42, "field": "doc_id"},
        "boost_mode": "replace",
    }},
    "size": 15,
    "_source": ["doc_id"],
}
RANK_FEATURE_BODY = {
    # static-signal ranking: saturation-damped document length with an
    # EXPLICIT pivot (the ES default pivot is a corpus statistic —
    # non-deterministic under ingestion, so this compiler requires it)
    "query": {"rank_feature": {
        "field": "n_chars",
        "saturation": {"pivot": 500},
        "boost": 2,
    }},
    "size": 15,
    "_source": ["doc_id", "n_chars"],
}
DISTANCE_FEATURE_BODY = {
    # freshness ranking: nearest events to an explicit instant, scored
    # pivot/(pivot+|ts-origin|) over microsecond-exact epochs
    "query": {"distance_feature": {
        "field": "ts",
        "origin": "2024-01-15 12:00:00",
        "pivot": "12h",
    }},
    "size": 12,
    "_source": ["event_id", "ts"],
}
COMBINED_FIELDS_BODY = {
    # term-centric BM25 over text+source merged into ONE synthetic
    # field (tf and length SUM across fields before scoring — the
    # semantics that distinguishes combined_fields from multi_match)
    "query": {"combined_fields": {
        "query": "table wiki",
        "fields": ["text", "source"],
    }},
    "size": 15,
    "_source": ["doc_id", "source"],
}
INTERVALS_BODY = {
    # positional proximity: 'table' then 'scan' with at most 3 tokens
    # between — one regex over the analyzed token string, exact
    # interval semantics, evaluated inside the scan (map-only)
    "query": {"intervals": {"text": {"match": {
        "query": "table scan", "max_gaps": 3, "ordered": True,
    }}}},
    "sort": [{"doc_id": "asc"}],
    "size": 500,
    "_source": ["doc_id", "lang"],
}
SPAN_NEAR_BODY = {
    # the classic Lucene span query: two terms within slop 2 in either
    # order, composed under a bool filter with a term clause — spans
    # are ordinary predicates here, so they compose anywhere a query
    # clause can appear
    "query": {"bool": {"filter": [
        {"term": {"lang": "en"}},
        {"span_near": {
            "clauses": [{"span_term": {"text": "fast"}},
                        {"span_term": {"text": "merge"}}],
            "slop": 2, "in_order": False,
        }},
    ]}},
    "sort": [{"doc_id": "asc"}],
    "size": 500,
    "_source": ["doc_id", "lang"],
}
# the geo bodies derive the loc_lat/loc_lon point columns from the
# fixture's integer keys via runtime_mappings (the % operator joined
# the Painless-lite grammar for exactly this) — deterministic points,
# so every geo kernel is oracle-checkable
_GEO_RM = {
    "loc_lat": {"type": "double",
                "script": {"source": "emit(doc['user_id'].value"
                                     " % 120 - 60)"}},
    "loc_lon": {"type": "double",
                "script": {"source": "emit(doc['event_id'].value"
                                     " % 300 - 150)"}},
}
GEO_DISTANCE_BODY = {
    # "events within 2000 km of the origin" — haversine over the ES
    # mean earth radius, evaluated inside the scan
    "runtime_mappings": _GEO_RM,
    "query": {"geo_distance": {
        "distance": "2000km", "loc": {"lat": 10, "lon": 20},
    }},
    "sort": [{"event_id": "asc"}],
    "size": 300,
    "_source": ["event_id", "loc_lat", "loc_lon"],
}
GEOTILE_GRID_BODY = {
    # the Kibana map request: slippy-map tile buckets with a centroid,
    # a bounds envelope, and an ordinary metric per tile
    "runtime_mappings": _GEO_RM,
    "query": {"term": {"event_type": "click"}},
    "aggs": {"tiles": {
        "geotile_grid": {"field": "loc", "precision": 3, "size": 12},
        "aggs": {
            "centroid": {"geo_centroid": {"field": "loc"}},
            "bounds": {"geo_bounds": {"field": "loc"}},
            "v_avg": {"avg": {"field": "value"}},
        },
    }},
    "size": 0,
}
RESCORE_BODY = {
    # the precision-pass idiom: cheap one-term recall query, then the
    # top-50 window re-ranked by a stricter AND query — rescore cost
    # bounded by window_size, never the corpus
    "query": {"match": {"text": "table"}},
    "rescore": {"window_size": 50, "query": {
        "rescore_query": {"match": {"text": {
            "query": "scan fast", "operator": "and",
        }}},
        "query_weight": 0.7,
        "rescore_query_weight": 1.2,
    }},
    "size": 20,
    "_source": ["doc_id", "lang"],
}
MIN_SCORE_BODY = {
    # score-threshold hits: only matches above 0.5 BM25 return
    "query": {"match": {"text": "table scan"}},
    "min_score": 0.5,
    "size": 100,
    "_source": ["doc_id"],
}
SLICED_SCROLL_BODY = {
    # slice 1 of 3: the parallel-export idiom — deterministic disjoint
    # md5-hash partitions of the hit set, unioning to exactly the full
    # result (asserted in tests)
    "query": {"term": {"lang": "en"}},
    "slice": {"id": 1, "max": 3},
    "sort": [{"doc_id": "asc"}],
    "size": 2000,
    "_source": ["doc_id"],
}
MATRIX_STATS_BODY = {
    # pairwise covariance/correlation across three lineitem measures
    # from ONE scan — exact DECIMAL sums-of-products, so partial-agg
    # order can't flip a bit
    "query": {"term": {"l_returnflag": "R"}},
    "aggs": {"m": {"matrix_stats": {
        "fields": ["l_quantity", "l_extendedprice", "l_discount"],
    }}},
    "size": 0,
}
TOP_METRICS_BODY = {
    # "the latest reading per host": per event type, the value on the
    # newest event, beside ordinary metrics — composable, unlike
    # top_hits
    "query": {"range": {"ts": {"gte": "2024-01-05"}}},
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 5},
        "aggs": {
            "v_avg": {"avg": {"field": "value"}},
            "latest": {"top_metrics": {
                "metrics": {"field": "value"},
                "sort": {"ts": "desc"},
            }},
            "earliest": {"top_metrics": {
                "metrics": [{"field": "value"}, {"field": "user_id"}],
                "sort": {"ts": "asc"},
            }},
        },
    }},
}
ZERO_FILL_BODY = {
    # the explicit Kibana default: min_doc_count 0 zero-fills the day
    # axis across extended_bounds; the running sum then accumulates
    # over the FILLED axis (gaps contribute 0), the dashboard shape
    "query": {"range": {"value": {"gte": 300}}},
    "aggs": {"daily": {
        "date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "min_doc_count": 0,
            "extended_bounds": {"min": "2024-01-01", "max": "2024-01-30"},
        },
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "n": {"value_count": {"field": "value"}},
            "run": {"cumulative_sum": {"buckets_path": "v_sum"}},
        },
    }},
}
DIS_MAX_BODY = {
    # dis_max union + a boosting wrapper inside one bool tree: the
    # compound-query wrappers in filter context
    "query": {"bool": {"filter": [
        {"dis_max": {"queries": [
            {"match": {"text": "merge"}},
            {"match_phrase": {"text": "table scan"}},
        ], "tie_breaker": 0.3}},
        {"boosting": {
            "positive": {"range": {"n_chars": {"gte": 80}}},
            "negative": {"term": {"lang": "zh"}},
            "negative_boost": 0.2,
        }},
    ]}},
    "sort": [{"doc_id": "asc"}],
    "size": 40,
    "_source": ["doc_id", "lang", "n_chars"],
}
PERCENTILES_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {"by_day": {
        "date_histogram": {"field": "ts", "calendar_interval": "week"},
        "aggs": {"v": {"percentiles": {
            "field": "value", "percents": [25, 50, 95, 99.9],
        }}},
    }},
}
FILTER_AGG_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-02"}}},
    "aggs": {"purchases": {
        "filter": {"term": {"event_type": "purchase"}},
        "aggs": {"v": {"stats": {"field": "value"}}},
    }},
}
GLOBAL_AGG_BODY = {
    # the query scopes hits; global ignores it — corpus-wide baseline
    "query": {"term": {"lang": "en"}},
    "aggs": {"all_docs": {
        "global": {},
        "aggs": {"chars": {"avg": {"field": "n_chars"}}},
    }},
}
COUNT_BODY = {
    "query": {"bool": {
        "filter": [{"term": {"lang": "en"}}],
        "must_not": [{"range": {"n_chars": {"lt": 120}}}],
    }},
}
RANGE_AGG_BODY = {
    "aggs": {
        "len_buckets": {
            "range": {
                "field": "n_chars",
                "ranges": [{"to": 150}, {"from": 150, "to": 350}, {"from": 350}],
            },
            "aggs": {
                "langs": {"cardinality": {"field": "lang"}},
                "chars": {"avg": {"field": "n_chars"}},
            },
        }
    },
}
# the TPC-H order/line hierarchy as an ES join-field relation: the
# declared key pair has_child/has_parent queries semi-join through
PARENT_CHILD_RELATIONS = {
    "lineitem": {"table": "lineitem", "parent_key": "o_orderkey",
                 "child_key": "l_orderkey", "id_field": "l_orderkey"},
    "orders": {"table": "orders", "parent_key": "o_orderkey",
               "child_key": "l_orderkey", "id_field": "o_orderkey"},
}
HAS_CHILD_BODY = {
    # "orders with at least two heavy line items" — the ES
    # parent-by-children idiom, compiled as an aggregate-then-semi-join
    "query": {"has_child": {
        "type": "lineitem",
        "query": {"range": {"l_quantity": {"gte": 45}}},
        "min_children": 2,
    }},
    "sort": [{"o_orderkey": "asc"}],
    "size": 200,
    "_source": ["o_orderkey", "o_orderstatus"],
}
HAS_PARENT_BODY = {
    # "returned line items of big orders" — has_parent composed under
    # bool beside an ordinary term clause
    "query": {"bool": {"filter": [
        {"term": {"l_returnflag": "R"}},
        {"has_parent": {
            "parent_type": "orders",
            "query": {"range": {"o_totalprice": {"gte": 200000}}},
        }},
    ]}},
    "sort": [{"l_orderkey": "asc"}, {"l_linenumber": "asc"}],
    "size": 200,
    "_source": ["l_orderkey", "l_linenumber", "l_returnflag"],
}
SUGGEST_TERM_BODY = {
    # spell correction against the corpus vocabulary: two misspelled
    # tokens; 'table' is in-vocabulary, so missing mode skips it
    "suggest": {"fix": {
        "text": "tabel scna table",
        "term": {"field": "text", "size": 3, "max_edits": 2,
                 "min_doc_freq": 2},
    }},
    "size": 0,
}
SUGGEST_PHRASE_BODY = {
    # "did you mean": whole-query correction — both tokens misspelled,
    # the lattice recovers the common phrase
    "suggest": {"didyoumean": {
        "text": "tabel scna",
        "phrase": {"field": "text", "size": 4, "max_edits": 2,
                   "candidates_per_term": 3},
    }},
    "size": 0,
}
SUGGEST_COMPLETION_BODY = {
    # search-box autocomplete over the analyzed vocabulary
    "suggest": {"autocomplete": {
        "prefix": "sc",
        "completion": {"field": "text", "size": 8},
    }},
    "size": 0,
}
HISTOGRAM_ZERO_FILL_BODY = {
    # the numeric sibling of the Kibana zero-filled date axis
    "query": {"term": {"event_type": "click"}},
    "aggs": {"v_hist": {
        "histogram": {
            "field": "value", "interval": 100, "min_doc_count": 0,
            "extended_bounds": {"min": -200, "max": 1200},
        },
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "n_users": {"cardinality": {"field": "user_id"}},
        },
    }},
    "size": 0,
}
T_TEST_BODY = {
    # Welch's t over two event populations from ONE scan
    "aggs": {"all_docs": {
        "filter": {"match_all": {}},
        "aggs": {"click_vs_view": {"t_test": {
            "a": {"field": "value",
                  "filter": {"term": {"event_type": "click"}}},
            "b": {"field": "value",
                  "filter": {"term": {"event_type": "view"}}},
            "type": "heteroscedastic",
        }}},
    }},
    "size": 0,
}
MATCH_BOOL_PREFIX_BODY = {
    # search-as-you-type: full terms + a trailing prefix, no adjacency
    "query": {"match_bool_prefix": {"text": {
        "query": "table sca", "operator": "and",
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 200,
    "_source": ["doc_id", "lang", "n_chars"],
}
PINNED_BODY = {
    # sponsored results: three promoted ids, organic BM25 below
    "query": {"pinned": {
        "ids": [42, 7, 300],
        "organic": {"match": {"text": "vector scan"}},
    }},
    "_source": ["doc_id", "lang"],
    "size": 25,
}
RUNTIME_FIELDS_BODY = {
    # Kibana runtime fields: a derived metric defined in the request,
    # then queried, bucketed, and aggregated like a mapped field
    "runtime_mappings": {
        "chars_per_src": {
            "type": "double",
            "script": {"source": "emit(doc['n_chars'].value / 25)"},
        },
        "is_long": {
            "type": "boolean",
            "script": {"source": "emit(doc['n_chars'].value >= 300)"},
        },
    },
    "query": {"range": {"chars_per_src": {"gte": 4}}},
    "aggs": {"by_long": {
        "terms": {"field": "is_long"},
        "aggs": {"chars_avg": {"avg": {"field": "n_chars"}}},
    }},
    "size": 0,
}
MOVING_PERCENTILES_BODY = {
    # smoothed p50/p90 of daily click value over a trailing week
    "query": {"term": {"event_type": "click"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {
            "v": {"sum": {"field": "value"}},
            "v_smooth": {"moving_percentiles": {
                "buckets_path": "v", "window": 7, "shift": 1,
                "percents": [50, 90],
            }},
        },
    }},
    "size": 0,
}
CUMULATIVE_CARDINALITY_BODY = {
    # "total unique users to date" on a daily axis — exact, where ES
    # chains HLL sketches
    "query": {"term": {"event_type": "view"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {
            "users": {"cardinality": {"field": "user_id"}},
            "total_users": {"cumulative_cardinality": {
                "buckets_path": "users",
            }},
        },
    }},
    "size": 0,
}
MORE_LIKE_THIS_BODY = {
    # "find documents like this one": in-plan rare-term selection from
    # the liked doc, idf-sum scoring, 30% coordination
    "query": {"more_like_this": {
        "fields": ["text"],
        "like": [{"_id": 7}],
        "max_query_terms": 10,
        "min_term_freq": 2,
        "min_doc_freq": 5,
        "minimum_should_match": "30%",
    }},
    "_source": ["doc_id", "lang"],
    "size": 30,
}
DATE_MATH_BODY = {
    # ES date math with absolute anchors (deterministic for the
    # differential; `now` anchors serve live HTTP with the same code
    # path, pinned via es_datemath.set_now in tests): a rolling window
    # [Jan 1, Jan 11) spelled the way Kibana time pickers spell it
    "query": {"bool": {"filter": [
        {"range": {"ts": {"gte": "2024-01-04||-3d/d",
                          "lt": "2024-01-04||+1w/d"}}},
        {"term": {"event_type": "click"}},
    ]}},
    "sort": [{"ts": "asc"}, {"event_id": "asc"}],
    "size": 500,
    "_source": ["event_id", "user_id", "value"],
}
SEARCH_TEMPLATE = {
    # the Kibana saved-search shape: one template, typed params —
    # {{min_chars}} substitutes a typed int (whole-string rule),
    # {{lang}} interpolates into the term
    "source": {
        "query": {"bool": {"filter": [
            {"term": {"lang": "{{lang}}"}},
            {"range": {"n_chars": {"gte": "{{min_chars}}"}}},
        ]}},
        "sort": [{"doc_id": "asc"}],
        "size": 100,
        "_source": ["doc_id", "lang", "n_chars"],
    },
    "params": {"lang": "en", "min_chars": 200},
}
SCROLL_BODY = {
    # a deep-paginatable filter-context search: sort fields live in
    # _source (the stateless cursor is read from the result columns)
    "query": {"range": {"n_chars": {"gte": 100}}},
    "sort": [{"n_chars": "asc"}],
    "size": 40,
    "_source": ["doc_id", "lang", "n_chars"],
}
_MTERMVECTORS_IDS = [3, 7, 11, 9999999]  # last id absent: found=false path
GEO_RINGS_BODY = {
    # distance-ring buckets (the store-locator / coverage-report agg):
    # haversine rings around an origin with a metric per ring
    "runtime_mappings": _GEO_RM,
    "aggs": {"rings": {
        "geo_distance": {
            "field": "loc", "origin": {"lat": 0, "lon": 0},
            "unit": "km",
            "ranges": [{"to": 2000}, {"from": 2000, "to": 6000},
                       {"from": 6000}],
        },
        "aggs": {"v_avg": {"avg": {"field": "value"}}},
    }},
    "size": 0,
}
PHRASE_SLOP_BODY = {
    # sloppy phrase: 'table' then 'scan' within 2 moves (incl. the
    # transposed order at cost 2) — Lucene slop semantics, exact for
    # two terms
    "query": {"match_phrase": {"text": {
        "query": "table scan", "slop": 2,
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 300,
    "_source": ["doc_id"],
}
FIELD_BOOSTS_BODY = {
    # caret boosts: text matches count 3x before the most_fields sum —
    # the everyday relevance-tuning syntax
    "query": {"multi_match": {
        "query": "table wiki",
        "fields": ["text^3", "source"],
        "type": "most_fields",
    }},
    "size": 15,
    "_source": ["doc_id", "source"],
}
TERMS_LOOKUP_BODY = {
    # ES terms lookup: the allowed values come from ANOTHER document —
    # "docs in the same language as doc 7" — compiled as a one-row
    # IN-subquery (broadcast semi-join at any scale)
    "query": {"terms": {"lang": {
        "index": "documents", "id": 7, "path": "lang",
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 50,
    "_source": ["doc_id", "lang"],
}
SCRIPT_FIELDS_BODY = {
    # the older per-hit computed-field API, normalized into the same
    # projection CTE runtime_mappings use; the derived field joins the
    # explicit _source automatically (ES returns them together)
    "query": {"term": {"lang": "en"}},
    "script_fields": {"kchars": {"script": {
        "source": "doc['n_chars'].value / 1000",
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 10,
    "_source": ["doc_id", "n_chars"],
}
OBJECT_FIELDS_BODY = {
    # ES object fields: dotted names reach inside a JSON column
    # (props.k -> $.k of the props document), typed by the comparison
    # value — the everyday "filter on a property bag" idiom
    "query": {"bool": {"filter": [
        {"term": {"event_type": "click"}},
        {"range": {"props.k": {"gte": 80}}},
    ]}},
    "sort": [{"event_id": "asc"}],
    "size": 400,
    "_source": ["event_id", "props"],
}
FS_OVER_BOOL_BODY = {
    # the full production query: relevance (bool of full-text musts +
    # shoulds, filter-gated) times a document-length decay — the
    # function_score-over-bool composition every tuned search app ships
    "query": {"function_score": {
        "query": {"bool": {
            "must": [{"match": {"text": "table"}}],
            "should": [{"match": {"text": "fast"}}],
            "filter": [{"term": {"lang": "en"}}],
        }},
        "gauss": {"n_chars": {"origin": 300, "scale": 200,
                              "decay": 0.5}},
        "boost_mode": "multiply",
    }},
    "size": 20,
    "_source": ["doc_id", "n_chars"],
}
SCORED_BOOL_BODY = {
    # the everyday ES search: full-text musts (scored, one boosted) +
    # an optional should + score-neutral filter/must_not gates —
    # _score is the Lucene boolean sum
    "query": {"bool": {
        "must": [
            {"match": {"text": "table"}},
            {"match": {"text": {"query": "scan", "boost": 2}}},
        ],
        "should": [{"match": {"text": "fast"}}],
        "filter": [{"term": {"lang": "en"}}],
        "must_not": [{"range": {"n_chars": {"gte": 550}}}],
    }},
    "size": 20,
    "_source": ["doc_id", "lang", "n_chars"],
}
RANK_EVAL_BODY = {
    # the relevance-tuning feedback loop: two queries scored against
    # human ratings with the DCG gain, one statement
    "requests": [
        {"id": "tables",
         "request": {"query": {"match": {"text": "table scan"}}},
         "ratings": [{"_id": 127, "rating": 3}, {"_id": 370, "rating": 2},
                     {"_id": 5, "rating": 1}]},
        {"id": "speed",
         "request": {"query": {"match": {"text": "fast merge"}}},
         "ratings": [{"_id": 12, "rating": 1}]},
    ],
    "metric": {"dcg": {"k": 10}},
}
PIT_SEARCH_BODY = {
    # the search half of a PIT round-trip: an ordinary filter search
    # the entry runs through es_pit_search after opening the pit
    "query": {"term": {"lang": "en"}},
    "sort": [{"doc_id": "asc"}],
    "size": 40,
    "_source": ["doc_id", "lang"],
}
ALIAS_SEARCH_BODY = {
    # an ordinary filter search, addressed AT AN ALIAS: the everyday
    # deployment seam (reads go through `docs_read` while the concrete
    # index rotates underneath)
    "query": {"range": {"n_chars": {"gte": 500}}},
    "sort": [{"doc_id": "asc"}],
    "size": 60,
    "_source": ["doc_id", "lang", "n_chars"],
}

MULTI_INDEX_SEARCH_BODY = {
    # a search addressed at a WILDCARD index expression (`*ion` ->
    # region + nation): the ES comma/wildcard multi-index read, same
    # missing-column-as-NULL union as the multi-target alias; the
    # bool/should keeps rows from BOTH indices and the two-key sort
    # (each missing in the other index, missing=_last) orders them
    # deterministically.
    "query": {"bool": {"should": [
        {"exists": {"field": "r_regionkey"}},
        {"exists": {"field": "n_nationkey"}},
    ], "minimum_should_match": 1}},
    "sort": [{"r_regionkey": {"order": "asc", "missing": "_last"}},
             {"n_nationkey": {"order": "asc", "missing": "_last"}}],
    "size": 1000,
    "_source": ["r_regionkey", "r_name", "n_nationkey", "n_name",
                "n_regionkey"],
}

ALIAS_MULTI_BODY = {
    # a search addressed at a MULTI-TARGET alias (customer+supplier):
    # the union carries every column with missing-as-NULL, so a
    # per-index field (c_acctbal / s_acctbal) filters only its own
    # index's rows — the real ES multi-index alias read shape
    # (VERDICT r11 ask #3). Sorting uses missing=_last so rows from
    # the index lacking the sort field order deterministically.
    "query": {"bool": {"should": [
        {"range": {"c_acctbal": {"gte": 9000}}},
        {"range": {"s_acctbal": {"gte": 9000}}},
    ], "minimum_should_match": 1}},
    "sort": [{"c_custkey": {"order": "asc", "missing": "_last"}},
             {"s_suppkey": {"order": "asc", "missing": "_last"}}],
    "size": 10000,
    "_source": ["c_custkey", "c_name", "c_acctbal",
                "s_suppkey", "s_name", "s_acctbal"],
}
