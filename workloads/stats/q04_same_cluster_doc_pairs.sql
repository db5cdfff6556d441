SELECT v1.label, count(*) AS n_pairs
FROM documents d1, embeddings v1, embeddings v2, documents d2
WHERE d1.doc_id = v1.vec_id AND d2.doc_id = v2.vec_id
  AND v1.label = v2.label
  AND v1.vec_id < v2.vec_id
  AND d1.lang = 'en' AND d2.lang = 'de'
  AND d1.n_chars > 200 AND d2.n_chars > 200
GROUP BY v1.label ORDER BY v1.label
