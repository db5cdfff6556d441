-- generated: QueryGenerator.statsWalkQuery(seed = 5039,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, documents d3, embeddings v1, embeddings v2, embeddings v3 WHERE d2.lang = d1.lang AND d3.lang = d1.lang AND v1.vec_id = d2.doc_id AND v2.vec_id = d1.doc_id AND v3.label = v2.label AND v1.label < 7 AND d3.lang <> 'de' AND d2.source <> 'src5' AND v3.label < 7 AND d2.lang = 'fr'
