-- generated: QueryGenerator.statsWalkQuery(seed = 6028,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, embeddings v2, documents d1, documents d2, documents d3 WHERE v2.label = v1.label AND d1.doc_id = v2.vec_id AND d2.doc_id = v1.vec_id AND d3.doc_id = v1.vec_id AND d2.n_chars < 200 AND d3.source <> 'src3' AND d1.lang = 'es'
