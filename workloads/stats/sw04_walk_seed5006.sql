-- generated: QueryGenerator.statsWalkQuery(seed = 5006,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, embeddings v2, documents d1 WHERE v2.label = v1.label AND d1.doc_id = v1.vec_id AND v1.label < 2 AND d1.n_chars < 200 AND d1.source = 'src2'
