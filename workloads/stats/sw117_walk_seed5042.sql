-- generated: QueryGenerator.statsWalkQuery(seed = 5042,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, documents d1, documents d2, embeddings v2, embeddings v3 WHERE d1.doc_id = v1.vec_id AND d2.lang = d1.lang AND v2.vec_id = d2.doc_id AND v3.label = v2.label AND d1.source <> 'src13' AND v1.label > 1 AND d2.n_chars < 100 AND d2.source = 'src1'
