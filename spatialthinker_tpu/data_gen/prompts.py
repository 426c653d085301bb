"""Prompt templates for the STVQA synthesis pipeline.

Functional parity with /root/reference/data_gen/prompt.py: a question-generation
prompt fed Visual-Genome scene graphs plus live dataset statistics (the
$DATA_STATS$ slot), a scene-graph few-shot question prefix carrying the image
size, and a GPT-4o validation prompt. Text is original; the structural contract
(JSON output schema, category/level taxonomy, stats feedback) is identical.
"""

CATEGORIES = [
    "relation", "reach", "size", "orientation", "instance_location",
    "depth", "distance", "count", "existence",
]
LEVELS = ["easy", "medium", "hard"]

QUESTION_GEN_PROMPT = """You are generating one spatial-reasoning multiple-choice question about an image, given its ground-truth scene graph (objects with pixel bounding boxes [x1, y1, x2, y2] and subject-predicate-object relationships).

Requirements:
- The question must be answerable purely from spatial evidence in the scene graph (positions, sizes, depth ordering, counts, existence, reachability, orientation, or inter-object relations).
- Write exactly 4 answer options labeled (A) through (D), with exactly one correct option.
- Pick the question category from: relation, reach, size, orientation, instance_location, depth, distance, count, existence.
- Pick a difficulty level from: easy, medium, hard.
- Rate the question quality from 1 (trivial/ambiguous) to 10 (crisp, unambiguous, genuinely spatial).

Dataset balance so far (generate questions for UNDER-represented categories and levels; target is a uniform category spread and a 40/40/20 easy/medium/hard split):
$DATA_STATS$

Return ONLY a JSON object with this schema:
{
  "question": "...",
  "options": ["(A) ...", "(B) ...", "(C) ...", "(D) ..."],
  "answer": "A",
  "category": "...",
  "level": "easy|medium|hard",
  "rating": 7
}

Scene graph follows:
"""

QUESTION_PREFIX = """Observe the image and reason about the spatial layout of its objects. Identify the objects relevant to the question, localise them with pixel-coordinate bounding boxes [x1, y1, x2, y2], and note any relationships between them before answering. Image size: ({W} x {H})"""

VALIDATION_PROMPT = """You are checking a multiple-choice visual question for answerability and correctness. Look at the image and the question below, then answer with ONLY the single option letter (A, B, C, or D) you believe is correct.

Question: {question}
Options:
{options}
"""
