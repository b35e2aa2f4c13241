def inc: . + 1;
def sumxs: reduce .xs[] as $x (0; . + $x);
